"""Recurrent state encoder — torch-gate-compatible LSTM/GRU with scan.

Rebuild of ``model_utils/rnns/rnn_state_encoder.py:5-140``.  The reference's
``seq_forward`` dynamically splits the time axis at episode boundaries
(``has_zeros``) and zero-masks the hidden state at each split — data-dependent
Python control flow that cannot live under ``jit``.  The TPU formulation is a
``lax.scan`` over time with a per-step reset ``h_t = h_{t-1} * mask_t``, which
is *exactly* equivalent (within a no-reset chunk all masks are 1, and at a
boundary the multiply implements the zero reset).

Gate math and parameter layout follow torch.nn.LSTM/GRU exactly (gate order
i,f,g,o / r,z,n; separate b_ih and b_hh) so ``.pth`` checkpoints import as-is.
The LSTM hidden+cell state is packed along the layer axis
([h_0..h_{L-1}, c_0..c_{L-1}], shape [2L, N, H]) matching the reference's
``_pack_hidden`` (rnn_state_encoder.py:45-58) — rollout storage keeps the same
layout.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _linear(p, x, name):
    return x @ p[f"w_{name}"].T + p[f"b_{name}"]


class RNNStateEncoder(nn.Module):
    input_size: int
    hidden_size: int
    num_layers: int = 1
    rnn_type: str = "LSTM"
    dtype: Any = jnp.float32

    @property
    def num_recurrent_layers(self) -> int:
        return self.num_layers * (2 if self.rnn_type == "LSTM" else 1)

    def _params(self):
        g = 4 if self.rnn_type == "LSTM" else 3
        h = self.hidden_size
        ps = []
        for l in range(self.num_layers):
            d_in = self.input_size if l == 0 else h
            init = nn.initializers.orthogonal()
            ps.append(
                {
                    "w_ih": self.param(f"w_ih_l{l}", init, (g * h, d_in)),
                    "w_hh": self.param(f"w_hh_l{l}", init, (g * h, h)),
                    "b_ih": self.param(f"b_ih_l{l}", nn.initializers.zeros, (g * h,)),
                    "b_hh": self.param(f"b_hh_l{l}", nn.initializers.zeros, (g * h,)),
                }
            )
        return ps

    def _lstm_cell(self, p, x, h, c):
        gates = _linear(p, x, "ih") + _linear(p, h, "hh")
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    def _gru_cell(self, p, x, h):
        gi = _linear(p, x, "ih")
        gh = _linear(p, h, "hh")
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h

    def _step(self, params, x, hidden, mask):
        """One timestep through the stack. hidden: [pack, N, H], mask: [N, 1]."""
        hidden = hidden * mask[None]
        out = x
        new_hidden = []
        if self.rnn_type == "LSTM":
            hs, cs = hidden[: self.num_layers], hidden[self.num_layers :]
            new_cs = []
            for l, p in enumerate(params):
                h, c = self._lstm_cell(p, out, hs[l], cs[l])
                out = h
                new_hidden.append(h)
                new_cs.append(c)
            new_hidden = jnp.stack(new_hidden + new_cs)
        else:
            for l, p in enumerate(params):
                h = self._gru_cell(p, out, hidden[l])
                out = h
                new_hidden.append(h)
            new_hidden = jnp.stack(new_hidden)
        return out, new_hidden

    @nn.compact
    def __call__(self, x, hidden, masks) -> Tuple[jax.Array, jax.Array]:
        """Dispatch on rank like the reference's forward (:136-140).

        - single step: x [N, D], masks [N, 1]     -> out [N, H]
        - sequence:    x [T, N, D], masks [T, N, 1] -> out [T, N, H]
        hidden: [num_recurrent_layers, N, H] (packed).
        """
        params = self._params()
        if x.ndim == 2:
            return self._step(params, x, hidden, masks)

        def scan_fn(h, inp):
            xt, mt = inp
            out, h = self._step(params, xt, h, mt)
            return h, out

        hidden, outs = jax.lax.scan(scan_fn, hidden, (x, masks))
        return outs, hidden
