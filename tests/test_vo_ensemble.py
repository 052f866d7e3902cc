"""Tests for the stacked-expert VO ensemble and fused preprocessing."""

import numpy as np

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.ops.depth import discretize_depth
from pointnav_vo_tpu.ops.topdown import top_down_view_batch
from pointnav_vo_tpu.vo.ensemble import (
    VOEnsemble,
    VOInferenceConfig,
    preprocess_obs_pairs,
    stack_expert_variables,
)
from _utils import fast_init

_CACHE = {}

CFG = VOInferenceConfig(vis_size_w=64, vis_size_h=48)


def _make_ensemble(seed=0):
    if "ens" not in _CACHE:
        model = CFG.make_model()
        obs = _dummy_obs(2)
        per_action = [fast_init(model, obs, train=False, seed=s) for s in range(3)]
        _CACHE["ens"] = (
            VOEnsemble(CFG, stack_expert_variables(per_action)), model, per_action
        )
    return _CACHE["ens"]


def _dummy_obs(batch, seed=1):
    rng = np.random.default_rng(seed)
    return {
        "rgb": jnp.asarray(rng.uniform(0, 255, size=(batch, 48, 64, 6)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0, 1, size=(batch, 48, 64, 2)), jnp.float32),
        "discretized_depth": jnp.asarray(
            rng.integers(0, 2, size=(batch, 48, 64, 20)), jnp.float32
        ),
        "top_down_view": jnp.asarray(rng.uniform(0, 1, size=(batch, 48, 64, 2)), jnp.float32),
    }


def test_preprocess_obs_pairs_matches_direct_ops():
    rng = np.random.default_rng(2)
    b = 3
    prev_rgb = jnp.asarray(rng.uniform(0, 255, size=(b, 48, 64, 3)), jnp.float32)
    cur_rgb = jnp.asarray(rng.uniform(0, 255, size=(b, 48, 64, 3)), jnp.float32)
    prev_depth = jnp.asarray(rng.uniform(0, 1, size=(b, 48, 64, 1)), jnp.float32)
    cur_depth = jnp.asarray(rng.uniform(0, 1, size=(b, 48, 64, 1)), jnp.float32)

    obs = preprocess_obs_pairs(prev_rgb, prev_depth, cur_rgb, cur_depth, CFG)
    assert obs["rgb"].shape == (b, 48, 64, 6)
    assert obs["depth"].shape == (b, 48, 64, 2)
    assert obs["discretized_depth"].shape == (b, 48, 64, 20)
    assert obs["top_down_view"].shape == (b, 48, 64, 2)

    np.testing.assert_array_equal(
        np.asarray(obs["discretized_depth"][..., :10]),
        np.asarray(discretize_depth(prev_depth[..., 0], 10)),
    )
    np.testing.assert_array_equal(
        np.asarray(obs["top_down_view"][..., 0]),
        np.asarray(top_down_view_batch(prev_depth[..., 0], CFG.topdown_params)),
    )
    # one-hot exactness, the reference's own invariant
    np.testing.assert_array_equal(
        np.asarray(obs["discretized_depth"].sum(-1)), 2.0 * np.ones((b, 48, 64))
    )


def test_det_mode_selects_expert_by_action():
    ensemble, model, per_action = _make_ensemble()
    b = 2
    obs = _dummy_obs(b)
    actions = jnp.asarray([1, 3], jnp.int32)

    delta, std = ensemble.predict(obs, actions)
    assert delta.shape == (b, 3)
    np.testing.assert_array_equal(np.asarray(std), 0.0)

    for expert, act in enumerate((1, 2, 3)):
        want = model.apply(per_action[expert], obs, train=False)
        sel = np.flatnonzero(np.asarray(actions) == act)
        np.testing.assert_allclose(
            np.asarray(delta)[sel], np.asarray(want)[sel], atol=1e-6
        )


def test_rnd_mode_dropout_ensemble():
    cfg = VOInferenceConfig(vis_size_w=64, vis_size_h=48, mode="rnd", rnd_mode_n=4)
    base, _, _ = _make_ensemble()
    obs = _dummy_obs(2)
    ens = VOEnsemble(cfg, base.variables)

    actions = jnp.asarray([1, 2], jnp.int32)
    rng = jax.random.PRNGKey(7)
    delta, std = ens.predict(obs, actions, rng=rng)
    assert delta.shape == (2, 3) and std.shape == (2, 3)
    assert float(jnp.max(std)) > 0.0  # dropout produces spread
    # deterministic given the same rng
    delta2, std2 = ens.predict(obs, actions, rng=rng)
    np.testing.assert_array_equal(np.asarray(delta), np.asarray(delta2))


def test_bucketed_det_path_matches_all_experts():
    """Each sample running only its own expert (static buckets) is equal to
    the all-experts + gather program — including skewed and empty buckets."""
    ensemble, _, _ = _make_ensemble()
    cases = [
        np.array([1, 3, 2, 1, 1, 2, 3, 1], np.int32),  # mixed
        np.array([1, 1, 1, 1, 1, 1, 1, 1], np.int32),  # all-forward (skew)
        np.array([2, 3], np.int32),                     # no forward samples
        np.array([0, 1, 2], np.int32),                  # STOP clips to forward
    ]
    for actions in cases:
        b = len(actions)
        obs = _dummy_obs(b, seed=int(actions.sum()))
        ref, _ = ensemble.predict(obs, jnp.asarray(actions))
        fast, std = ensemble.predict(obs, actions)  # numpy actions -> buckets
        np.testing.assert_array_equal(np.asarray(std), 0.0)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


def test_bucketed_bf16_selection_is_exact():
    """bf16 mode: the bf16 one-hot selection (single MXU pass) still returns
    bit-equal per-sample outputs vs the all-experts path."""
    cfg_bf16 = VOInferenceConfig(vis_size_w=64, vis_size_h=48, dtype=jnp.bfloat16)
    base, _, _ = _make_ensemble()
    vars_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        base.variables)
    ens = VOEnsemble(cfg_bf16, vars_bf16)
    obs = {k: v.astype(jnp.bfloat16) for k, v in _dummy_obs(6, seed=9).items()}
    actions = np.array([1, 2, 3, 1, 1, 2], np.int32)

    # the bf16 one-hot row selection itself is bit-exact
    idx = jnp.asarray([0, 2, 5], jnp.int32)
    sel = jax.nn.one_hot(idx, 6, dtype=jnp.bfloat16)
    picked = jnp.einsum("cb,b...->c...", sel, obs["rgb"],
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(picked), np.asarray(obs["rgb"][idx]))

    # end-to-end preds agree to bf16 rounding (the all-experts path lowers
    # convs as a batched/vmapped program with a different reduction order,
    # so exact bit-equality across the two programs is not defined in bf16)
    ref, _ = ens.predict(obs, jnp.asarray(actions))
    fast, _ = ens.predict(obs, actions)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=0.05, atol=0.02)


def test_static_buckets_match_all_experts_with_bounded_signatures():
    """The occupancy-sorted quarter-grid buckets give the same per-sample
    outputs as the all-experts path, with capacities drawn from multiples of
    ceil(B/4) — a bounded signature set for any action mix (power-of-two
    capacities recompiled per exact mix, ~3 s/step amortized in live loops)."""
    from pointnav_vo_tpu.vo.ensemble import (
        _predict_det_bucketed,
        bucket_expert_indices_static,
    )

    ensemble, model, _ = _make_ensemble()
    cases = {
        (1, 3, 2, 1, 1, 2, 3, 1): [4, 2, 2],   # counts (4,2,2)
        (1, 1, 1, 1, 1, 1, 1, 1): [8, 0, 0],   # all-forward
        (2, 3, 2, 3, 2, 3, 2, 3): [4, 4, 0],   # turn-only
        (1, 1, 1, 1, 1, 2, 3, 3): [6, 2, 2],   # counts (5,2,1) -> caps 6,2,2
    }
    for actions, want_caps in cases.items():
        actions = np.asarray(actions, np.int32)
        b = len(actions)
        obs = _dummy_obs(b, seed=int(actions.sum()))
        buckets, order = bucket_expert_indices_static(actions, b)
        assert [len(i) for i in buckets] == want_caps
        ref, _ = ensemble.predict(obs, jnp.asarray(actions))
        fast = _predict_det_bucketed(ensemble.model, ensemble.cfg,
                                     ensemble.variables, obs, buckets,
                                     jnp.asarray(order))
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   atol=1e-6, rtol=1e-6)


def test_static_bucket_layout():
    from pointnav_vo_tpu.vo.ensemble import bucket_expert_indices_static

    idx, order = bucket_expert_indices_static(
        np.array([1] * 5 + [2] * 3, np.int32), 8)
    assert [len(i) for i in idx] == [6, 4, 0]  # 5->6, 3->4, 0->0 (quantum 2)
    assert list(order) == [0, 1, 2]  # occupancy-sorted expert assignment
    assert list(idx[0][:5]) == [0, 1, 2, 3, 4]
    assert idx[0][5] == 8  # pad = batch (dropped row)


def test_full_api_fused():
    ensemble, _, _ = _make_ensemble()
    rng = np.random.default_rng(4)
    b = 2
    prev_rgb = jnp.asarray(rng.uniform(0, 255, size=(b, 48, 64, 3)), jnp.float32)
    cur_rgb = jnp.asarray(rng.uniform(0, 255, size=(b, 48, 64, 3)), jnp.float32)
    prev_depth = jnp.asarray(rng.uniform(0, 1, size=(b, 48, 64, 1)), jnp.float32)
    cur_depth = jnp.asarray(rng.uniform(0, 1, size=(b, 48, 64, 1)), jnp.float32)
    actions = jnp.asarray([1, 3], jnp.int32)

    delta, std, extra = ensemble.compute_local_delta_states_from_vo(
        prev_rgb, prev_depth, cur_rgb, cur_depth, actions
    )
    assert delta.shape == (b, 3)
    assert extra["ego_top_down_view"].shape == (b, 48, 64, 2)
    assert np.all(np.isfinite(np.asarray(delta)))


def test_packed_stem_input_matches_dict_path():
    """The packed stem block (frame_features_packed pairs) fed straight to
    the encoder matches the per-key dict path to 1 ulp (same elementwise
    ops and concat order — vo_cnn.py:88-106; XLA may strength-reduce the
    /255 to a reciprocal multiply differently across programs), fp32."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.vo.ensemble import (
        VOInferenceConfig,
        frame_features_packed,
        preprocess_obs_pairs,
    )
    from _utils import fast_init

    cfg = VOInferenceConfig(vis_size_w=32, vis_size_h=32)
    model = cfg.make_model()
    rng = np.random.default_rng(0)
    b = 4
    prev_rgb = jnp.asarray(rng.uniform(0, 255, (b, 32, 32, 3)), jnp.float32)
    cur_rgb = jnp.asarray(rng.uniform(0, 255, (b, 32, 32, 3)), jnp.float32)
    prev_d = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 1)), jnp.float32)
    cur_d = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 1)), jnp.float32)

    obs = preprocess_obs_pairs(prev_rgb, prev_d, cur_rgb, cur_d, cfg)
    dummy = {k: v[:1] for k, v in obs.items()}
    variables = fast_init(model, dummy, train=False, seed=0)

    packed = jnp.concatenate(
        [frame_features_packed(prev_rgb, prev_d, cfg),
         frame_features_packed(cur_rgb, cur_d, cfg)], axis=-1)

    out_dict = model.apply(variables, obs, train=False)
    out_packed = model.apply(variables, packed, train=False)
    np.testing.assert_allclose(np.asarray(out_dict), np.asarray(out_packed),
                               rtol=2e-5, atol=2e-6)


def test_predict_step_cached_packed_cache_roundtrip():
    """predict_step_cached accepts a legacy dict cache on the first call and
    a packed cache thereafter; deltas equal the one-shot dict predict."""
    import numpy as np

    import jax.numpy as jnp

    from pointnav_vo_tpu.vo.ensemble import (
        VOEnsemble,
        VOInferenceConfig,
        frame_features,
        preprocess_obs_pairs,
        stack_expert_variables,
    )
    from _utils import fast_init

    cfg = VOInferenceConfig(vis_size_w=32, vis_size_h=32)
    model = cfg.make_model()
    rng = np.random.default_rng(1)
    b = 6
    f0_rgb = jnp.asarray(rng.uniform(0, 255, (b, 32, 32, 3)), jnp.float32)
    f1_rgb = jnp.asarray(rng.uniform(0, 255, (b, 32, 32, 3)), jnp.float32)
    f2_rgb = jnp.asarray(rng.uniform(0, 255, (b, 32, 32, 3)), jnp.float32)
    f0_d = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 1)), jnp.float32)
    f1_d = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 1)), jnp.float32)
    f2_d = jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 1)), jnp.float32)
    actions = np.asarray([1, 1, 2, 3, 1, 2], np.int32)

    dummy = {k: v[:1] for k, v in preprocess_obs_pairs(
        f0_rgb, f0_d, f1_rgb, f1_d, cfg).items()}
    per = [fast_init(model, dummy, train=False, seed=i) for i in range(3)]
    ens = VOEnsemble(cfg, stack_expert_variables(per))

    # legacy dict seed -> packed cache from then on
    cache = frame_features(f0_rgb, f0_d, cfg)
    d1, cache = ens.predict_step_cached(cache, f1_rgb, f1_d, actions)
    assert not isinstance(cache, dict)
    d2, cache = ens.predict_step_cached(cache, f2_rgb, f2_d, actions)

    ref1, _ = ens.predict(preprocess_obs_pairs(f0_rgb, f0_d, f1_rgb, f1_d, cfg),
                          actions)
    ref2, _ = ens.predict(preprocess_obs_pairs(f1_rgb, f1_d, f2_rgb, f2_d, cfg),
                          actions)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(ref1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(ref2), atol=1e-6)


def test_int8_feature_cache_close_to_native():
    """cache_dtype="int8" (PERF experiment: halve selection-einsum HBM
    traffic): quantized-cache deltas must track the native-cache path to
    quantization scale, and the cache really is int8."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.vo.ensemble import (
        VOEnsemble,
        VOInferenceConfig,
        stack_expert_variables,
    )

    h = w = 32
    rng = np.random.default_rng(0)

    def build(cache_dtype):
        cfg = VOInferenceConfig(vis_size_w=w, vis_size_h=h,
                                cache_dtype=cache_dtype)
        model = cfg.make_model()
        dummy = {
            "rgb": jnp.zeros((1, h, w, 6)), "depth": jnp.zeros((1, h, w, 2)),
            "discretized_depth": jnp.zeros((1, h, w, 20)),
            "top_down_view": jnp.zeros((1, h, w, 2)),
        }
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), dummy, train=False))
        one = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype) + 0.01, shapes)
        return VOEnsemble(cfg, stack_expert_variables([one, one, one]))

    prev_rgb = jnp.asarray(rng.uniform(0, 255, (8, h, w, 3)), jnp.float32)
    cur_rgb = jnp.asarray(rng.uniform(0, 255, (8, h, w, 3)), jnp.float32)
    prev_depth = jnp.asarray(rng.uniform(0, 1, (8, h, w, 1)), jnp.float32)
    cur_depth = jnp.asarray(rng.uniform(0, 1, (8, h, w, 1)), jnp.float32)
    actions = np.asarray([1, 1, 2, 3, 1, 2, 3, 1], np.int32)

    from pointnav_vo_tpu.vo.ensemble import frame_features_packed

    deltas = {}
    for cache_dtype in ("native", "int8"):
        ens = build(cache_dtype)
        feats = frame_features_packed(prev_rgb, prev_depth, ens.cfg)
        if cache_dtype == "int8":
            assert feats.dtype == jnp.int8
        delta, feats2 = ens.predict_step_cached(
            feats, cur_rgb, cur_depth, actions)
        if cache_dtype == "int8":
            assert feats2.dtype == jnp.int8  # returned cache stays quantized
        deltas[cache_dtype] = np.asarray(delta)

    # identical-weight forward on 1/127-quantized inputs: small, bounded
    diff = np.abs(deltas["int8"] - deltas["native"]).max()
    assert diff < 0.05, diff
    assert np.isfinite(deltas["int8"]).all()


def test_predict_step_cached_donation_always_usable():
    """The steady-state cached step donates prev_feats and XLA must actually
    reuse the buffer: no 'donated buffers were not usable' warning on the
    dict-seeded first call (packed outside the step) or any later call
    (VERDICT r4 item 9 — benign warnings silenced so real ones stand out)."""
    import warnings

    import numpy as np

    import jax
    import jax.numpy as jnp

    from pointnav_vo_tpu.vo.ensemble import (
        VOEnsemble,
        VOInferenceConfig,
        frame_features,
        preprocess_obs_pairs,
        stack_expert_variables,
    )
    from _utils import fast_init

    cfg = VOInferenceConfig(vis_size_w=32, vis_size_h=32)
    model = cfg.make_model()
    rng = np.random.default_rng(2)
    b = 4
    frames = [
        (jnp.asarray(rng.uniform(0, 255, (b, 32, 32, 3)), jnp.float32),
         jnp.asarray(rng.uniform(0, 1, (b, 32, 32, 1)), jnp.float32))
        for _ in range(4)
    ]
    actions = np.asarray([1, 2, 3, 1], np.int32)
    dummy = {k: v[:1] for k, v in preprocess_obs_pairs(
        frames[0][0], frames[0][1], frames[1][0], frames[1][1], cfg).items()}
    ens = VOEnsemble(cfg, stack_expert_variables(
        [fast_init(model, dummy, train=False, seed=i) for i in range(3)]))

    cache = frame_features(frames[0][0], frames[0][1], cfg)  # legacy dict
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        for rgb, d in frames[1:]:
            delta, cache = ens.predict_step_cached(cache, rgb, d, actions)
        jax.block_until_ready(delta)
    bad = [w for w in caught if "donated buffers" in str(w.message).lower()]
    assert not bad, [str(w.message) for w in bad]
