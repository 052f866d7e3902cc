"""Multi-host rendezvous plumbing (init_distrib_slurm analogue,
reference ddp_utils.py:117-161) — env-var-mocked, no real cluster."""

import jax
import pytest

from pointnav_vo_tpu.parallel import mesh as pm


@pytest.fixture
def captured_init(monkeypatch):
    calls = []

    def fake_initialize(**kwargs):
        calls.append(kwargs)

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    return calls


def test_single_host_is_noop(monkeypatch, captured_init):
    for var in ("SLURM_NTASKS", "SLURM_PROCID", "SLURM_STEP_NODELIST",
                "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    pm.init_distributed()
    assert captured_init == []


def test_slurm_rendezvous(monkeypatch, captured_init):
    monkeypatch.setenv("SLURM_NTASKS", "4")
    monkeypatch.setenv("SLURM_PROCID", "2")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "node[0-3],nodeX")
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    pm.init_distributed()
    assert len(captured_init) == 1
    kw = captured_init[0]
    assert kw["num_processes"] == 4
    assert kw["process_id"] == 2
    # coordinator = first node of the nodelist, default port
    assert kw["coordinator_address"] == "node:8476"


def test_explicit_coordinator_env(monkeypatch, captured_init):
    monkeypatch.delenv("SLURM_NTASKS", raising=False)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("SLURM_PROCID", "0")
    pm.init_distributed()
    assert len(captured_init) == 1
    assert captured_init[0]["coordinator_address"] == "10.0.0.1:1234"
    assert captured_init[0]["num_processes"] == 1
