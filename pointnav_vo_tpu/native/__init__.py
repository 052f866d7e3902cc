"""ctypes bindings for the native shm ring (builds libshm_ring.so on demand)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                    "native", "shm_ring.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "build")
_SO = os.path.join(_BUILD_DIR, "libshm_ring.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    """Build from source unless an existing .so matches the current source
    hash — never dlopen an unreviewed binary (build/ is gitignored; a
    checked-out blob with a fresh mtime would pass an mtime check)."""
    import hashlib

    os.makedirs(_BUILD_DIR, exist_ok=True)
    with open(_SRC, "rb") as f:
        src_hash = hashlib.sha256(f.read()).hexdigest()
    stamp = _SO + ".srchash"
    have = None
    if os.path.isfile(stamp):
        with open(stamp) as f:
            have = f.read().strip()
    if not os.path.isfile(_SO) or have != src_hash:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC, "-lrt"],
            check=True,
        )
        with open(stamp, "w") as f:
            f.write(src_hash)
    return _SO


def get_lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build())
            lib.rb_create.restype = ctypes.c_void_p
            lib.rb_create.argtypes = [ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
            lib.rb_attach.restype = ctypes.c_void_p
            lib.rb_attach.argtypes = [ctypes.c_char_p]
            lib.rb_push.restype = ctypes.c_int
            lib.rb_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                    ctypes.c_uint64, ctypes.c_int]
            lib.rb_pop.restype = ctypes.c_int
            lib.rb_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_uint64, ctypes.c_int]
            lib.rb_size.restype = ctypes.c_uint64
            lib.rb_size.argtypes = [ctypes.c_void_p]
            lib.rb_detach.argtypes = [ctypes.c_void_p]
            lib.rb_unlink.argtypes = [ctypes.c_char_p]
            _LIB = lib
        return _LIB


class ShmRing:
    """One lock-free SPSC ring in POSIX shared memory."""

    def __init__(self, name: str, slots: int = 0, slot_bytes: int = 0,
                 create: bool = False):
        self.lib = get_lib()
        self.name = name.encode()
        self._owner = create
        if create:
            self.ptr = self.lib.rb_create(self.name, slots, slot_bytes)
        else:
            self.ptr = self.lib.rb_attach(self.name)
        if not self.ptr:
            raise OSError(f"shm ring {'create' if create else 'attach'} failed: {name}")

    def push(self, buf, timeout_ms: int = 10000) -> None:
        data = memoryview(buf).cast("B")
        rc = self.lib.rb_push(
            self.ptr,
            (ctypes.c_char * len(data)).from_buffer_copy(data),
            len(data), timeout_ms,
        )
        if rc == -1:
            raise TimeoutError(f"rb_push timeout on {self.name!r}")
        if rc:
            raise ValueError(f"rb_push failed rc={rc}")

    def pop_into(self, out_array, timeout_ms: int = 10000) -> None:
        rc = self.lib.rb_pop(
            self.ptr, out_array.ctypes.data_as(ctypes.c_void_p),
            out_array.nbytes, timeout_ms,
        )
        if rc == -1:
            raise TimeoutError(f"rb_pop timeout on {self.name!r}")
        if rc:
            raise ValueError(f"rb_pop failed rc={rc}")

    def size(self) -> int:
        return int(self.lib.rb_size(self.ptr))

    def close(self) -> None:
        if self.ptr:
            self.lib.rb_detach(self.ptr)
            self.ptr = None
        if self._owner:
            self.lib.rb_unlink(self.name)
