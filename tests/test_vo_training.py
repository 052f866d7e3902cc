"""End-to-end VO training tests: scripted dataset -> engine -> losses down.

Covers SURVEY.md §4: the geo-invariance-on-GT ~ 0 debug check promoted to a
unit test, dataset schema compatibility, inverse augmentation pairing, and
training/eval/checkpoint round-trips — all habitat-free.
"""

import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pointnav_vo_tpu.common import MOVE_FORWARD, TURN_LEFT, TURN_RIGHT
from pointnav_vo_tpu.rl.envs import EnvConfig
from pointnav_vo_tpu.vo import losses as L
from pointnav_vo_tpu.vo.dataset import (FramePairReader,
                                        generate_scripted_dataset,
                                        unpack_twins)
from pointnav_vo_tpu.vo.engine import VORegressionEngine, VOTrainConfig
from pointnav_vo_tpu.vo.ensemble import VOInferenceConfig

from _utils import fast_init

W = H = 32
ENV_CFG = EnvConfig(image_h=H, image_w=W, max_episode_steps=60,
                    actuation_noise_multiplier=0.5)

REFERENCE_SCHEMA_KEYS = {
    "new_episodes", "actions", "collisions", "episode_start_positions",
    "episode_start_rotations", "episode_goal_positions",
    "prev_rgbs", "prev_depths", "prev_point_goal_vecs", "prev_episodic_gpses",
    "prev_episodic_compasses", "prev_global_positions", "prev_global_rotations",
    "cur_rgbs", "cur_depths", "cur_point_goal_vecs", "cur_episodic_gpses",
    "cur_episodic_compasses", "cur_global_positions", "cur_global_rotations",
    "delta_positions", "delta_rotations",
}


@pytest.fixture(scope="module")
def dataset_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vo_data") / "train.h5")
    n = generate_scripted_dataset(path, 96, env_cfg=ENV_CFG, seed=0)
    assert n == 96
    return path


def test_dataset_schema_matches_reference(dataset_path):
    with h5py.File(dataset_path, "r") as f:
        keys = list(f.keys())
        assert keys[0].startswith("chunk_")
        assert set(f[keys[0]].keys()) == REFERENCE_SCHEMA_KEYS
        grp = f[keys[0]]
        assert grp["prev_rgbs"].dtype == np.uint8
        assert grp["prev_depths"].dtype == np.float16
        assert grp["prev_rgbs"].shape[1] == H * W * 3


def test_reader_basic_batches(dataset_path):
    reader = FramePairReader(dataset_path, W, H)
    assert len(reader) == 96
    batches = list(reader.iter_batches(32, rng=np.random.default_rng(0)))
    assert sum(b.actions.shape[0] for b in batches) == 96
    b = batches[0]
    assert b.prev_rgb.shape == (32, H, W, 3)
    assert b.prev_depth.shape == (32, H, W, 1)
    assert b.gt_delta.shape == (32, 3)
    # forward deltas are ~[0, -0.25, 0] + noise
    fwd = b.gt_delta[b.actions == MOVE_FORWARD]
    if fwd.size:
        assert np.all(np.abs(fwd[:, 1] + 0.25) < 0.15)


def test_turn_dyaw_targets_clean(dataset_path):
    """Delta yaws must live in [-pi, pi] and concentrate at +-TURN_ANGLE —
    regression guard against the quaternion double-cover 2*pi ghost (the env
    keeps yaw unwrapped; delta quats are canonicalized w>=0)."""
    reader = FramePairReader(dataset_path, W, H, act_type=TURN_LEFT)
    batch = next(reader.iter_batches(64, rng=np.random.default_rng(2)))
    d = batch.gt_delta[:, 2]
    assert np.all(np.abs(d) <= np.pi)
    want = np.radians(ENV_CFG.turn_angle_deg)
    assert np.all(np.abs(d - want) < 0.2), (d.min(), d.max())


def test_inverse_augmentation_pairs(dataset_path):
    reader = FramePairReader(
        dataset_path, W, H, act_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",),
    )
    batch = next(reader.iter_batches(16, rng=np.random.default_rng(1), drop_last=True))
    # alternating (primary, swapped) layout
    assert np.all(batch.data_types[0::2] == 0)
    assert np.all(batch.data_types[1::2] == 1)
    # swapped action is the opposite turn
    a0, a1 = batch.actions[0::2], batch.actions[1::2]
    assert np.all((a0 == TURN_LEFT) == (a1 == TURN_RIGHT))
    # all-twin batches ship entry-level pixels once (device expands);
    # the swap is recovered exactly by unpack_twins
    assert batch.twins_packed
    assert batch.prev_rgb.shape[0] == batch.actions.shape[0] // 2
    unpacked = unpack_twins(batch)
    np.testing.assert_array_equal(unpacked.prev_rgb[0], unpacked.cur_rgb[1])
    np.testing.assert_array_equal(unpacked.prev_rgb[1], unpacked.cur_rgb[0])

    # geo-invariance loss on GT deltas ~ 0 (the reference's train_debug check)
    gt = jnp.asarray(batch.gt_delta)
    loss, abs_rot, abs_pos = L.geo_invariance_inverse_loss(
        gt[0::2], gt[1::2], jnp.asarray(batch.actions[0::2])
    )
    assert float(abs_rot) < 1e-5
    assert float(jnp.max(abs_pos)) < 1e-5


def test_loss_weights_and_mse():
    gt = jnp.asarray([[0.1, -0.2, 0.3], [0.0, 0.0, 0.0]])
    pred = jnp.asarray([[0.2, -0.2, 0.1], [0.0, 0.1, 0.0]])
    w = L.compute_loss_weights(jnp.asarray([1, 2]), gt, {"dx": 1.0, "dz": 2.0, "dyaw": 3.0})
    np.testing.assert_allclose(np.asarray(w), [[1, 2, 3], [1, 2, 3]])
    loss, diag = L.weighted_mse_with_diagnostics(pred, gt, w)
    want = np.mean([0.01, 0.0]) * 1 + np.mean([0.0, 0.01]) * 2 + np.mean([0.04, 0.0]) * 3
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(diag["abs_diff"]), [0.05, 0.05, 0.1], atol=1e-6)


def test_geo_loss_zero_on_perfect_inverse():
    fwd = jnp.asarray([[0.01, -0.24, 0.5], [0.0, 0.0, -0.5]])
    # perfect inverse: dyaw_b = -dyaw_f; p_b = -R(dyaw_b) p_f
    cy, sy = jnp.cos(-fwd[:, 2]), jnp.sin(-fwd[:, 2])
    rot = jnp.stack([jnp.stack([cy, sy], -1), jnp.stack([-sy, cy], -1)], -2)
    pb = -jnp.einsum("pij,pj->pi", rot, fwd[:, :2])
    bwd = jnp.concatenate([pb, -fwd[:, 2:]], axis=-1)
    loss, abs_rot, abs_pos = L.geo_invariance_inverse_loss(
        fwd, bwd, jnp.asarray([TURN_LEFT, TURN_RIGHT])
    )
    assert float(loss) < 1e-10


def _small_icfg():
    return VOInferenceConfig(vis_size_w=W, vis_size_h=H)


def _fast_engine(icfg, tcfg, train_reader, eval_reader=None):
    model = icfg.make_model()
    dummy = {
        "rgb": jnp.zeros((1, H, W, 6)),
        "depth": jnp.zeros((1, H, W, 2)),
        "discretized_depth": jnp.zeros((1, H, W, 20)),
        "top_down_view": jnp.zeros((1, H, W, 2)),
    }
    n_exp = len(tcfg.expert_actions)
    per = [fast_init(model, dummy, train=False, seed=i) for i in range(n_exp)]
    return VORegressionEngine(
        icfg, tcfg, train_reader, eval_reader, init_variables_per_expert=per
    )


def test_bf16_mixed_precision_training(dataset_path):
    """bf16 fast mode: activations/convs in bf16, params + adam in fp32;
    loss improves and the param tree stays fp32."""
    icfg = VOInferenceConfig(vis_size_w=W, vis_size_h=H, dtype=jnp.bfloat16)
    tcfg = VOTrainConfig(batch_size=16, epochs=2, action_type=MOVE_FORWARD,
                         lr=2e-4)
    reader = FramePairReader(dataset_path, W, H, act_type=MOVE_FORWARD)
    engine = _fast_engine(icfg, tcfg, reader)

    losses = [engine.train_epoch()["mean_total_loss"] for _ in range(2)]
    assert all(np.isfinite(losses))
    assert losses[1] < losses[0], f"bf16 training did not improve: {losses}"
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(engine.variables["params"]))


def test_grad_and_obs_snapshots(dataset_path):
    """grad_snapshot returns a full per-parameter gradient tree (TB
    histograms) and obs_snapshot the preprocessed first-sample channels."""
    tcfg = VOTrainConfig(batch_size=16, epochs=1, action_type=MOVE_FORWARD)
    reader = FramePairReader(dataset_path, W, H, act_type=MOVE_FORWARD)
    engine = _fast_engine(_small_icfg(), tcfg, reader)

    grads = engine.grad_snapshot()
    leaves = jax.tree.leaves(grads)
    assert len(leaves) > 10  # one leaf per parameter array
    assert any(float(np.abs(np.asarray(g)).max()) > 0 for g in leaves)
    # same tree structure as the params (per-expert leading axis)
    assert (jax.tree_util.tree_structure(grads)
            == jax.tree_util.tree_structure(jax.device_get(
                engine.variables["params"])))

    obs0 = engine.obs_snapshot()
    assert obs0["rgb"].shape == (H, W, 6)
    assert obs0["depth"].shape == (H, W, 2)
    assert obs0["top_down_view"].shape == (H, W, 2)


def test_forward_engine_trains_and_evals(dataset_path, tmp_path):
    """Stage-1 style: forward-only model, loss decreases over epochs."""
    tcfg = VOTrainConfig(batch_size=16, epochs=3, action_type=MOVE_FORWARD,
                         lr=2e-4, log_interval=1)
    reader = FramePairReader(dataset_path, W, H, act_type=MOVE_FORWARD)
    engine = _fast_engine(_small_icfg(), tcfg, reader, reader)

    losses = []
    for _ in range(3):
        stats = engine.train_epoch()
        losses.append(stats["mean_total_loss"])
    # epoch-mean regression loss must come down from the untrained start
    assert min(losses[1:]) < losses[0], f"no improvement: {losses}"

    ev = engine.evaluate(save_pred_path=str(tmp_path / "delta_gt_pred.p"))
    assert ev["eval_samples"] > 0
    assert np.isfinite(ev["abs_diff_dz"])
    assert os.path.isfile(tmp_path / "delta_gt_pred.p")

    # checkpoint round-trip restores epoch + params
    ck = str(tmp_path / "ckpt.pkl")
    engine.save_ckpt(ck)
    engine2 = _fast_engine(_small_icfg(), tcfg, reader, reader)
    meta = engine2.load_ckpt(ck)
    assert meta["epoch"] == engine.epoch
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        engine.variables["params"], engine2.variables["params"],
    )


def test_reader_num_samples_matches_iteration(dataset_path):
    """num_samples() (the eval exact-count expectation) must equal what one
    epoch actually yields, in every filtering/augmentation mode."""
    for kwargs in (
        dict(),
        dict(act_type=MOVE_FORWARD),
        dict(act_type=TURN_LEFT,
             geo_invariance_types=("inverse_data_augment_only",)),
        dict(act_type=(TURN_LEFT, TURN_RIGHT),
             geo_invariance_types=("inverse_joint_train",)),
        dict(partial_data_n_splits=3),
    ):
        reader = FramePairReader(dataset_path, W, H, **kwargs)
        n = sum(b.actions.shape[0] for b in reader.iter_batches(13, rng=None))
        assert n == reader.num_samples(), kwargs


def test_unified_act_embed_training(dataset_path):
    """action_type=-1 unified (act-embed) TRAINING: the single expert's
    whitening stats must accumulate the whole batch (regression for the
    `actions == -1` zero-mass stats mask) and the loss must decrease."""
    icfg = VOInferenceConfig(model_name="vo_cnn_act_embed",
                             observation_space=("rgb", "depth"),
                             vis_size_w=W, vis_size_h=H)
    tcfg = VOTrainConfig(batch_size=16, epochs=2, action_type=-1, lr=2e-4,
                         log_interval=1)
    reader = FramePairReader(dataset_path, W, H, act_type=-1)
    model = icfg.make_model()
    dummy = {"rgb": jnp.zeros((1, H, W, 6)), "depth": jnp.zeros((1, H, W, 2))}
    per = [fast_init(model, dummy, jnp.zeros((1,), jnp.int32), train=False)]
    per[0]["batch_stats"] = jax.tree.map(jnp.zeros_like, per[0]["batch_stats"])
    engine = VORegressionEngine(icfg, tcfg, reader, reader,
                                init_variables_per_expert=per)
    losses = [engine.train_epoch()["mean_total_loss"] for _ in range(2)]
    count = float(
        engine.variables["batch_stats"]["visual_encoder"]["rmv"]["count"][0]
    )
    # 96 samples, batch 16, drop_last -> 6 batches/epoch * 16 * 2 epochs
    assert count == 192.0, f"whitening stats starved: count={count}"
    assert losses[1] < losses[0], f"no improvement: {losses}"
    ev = engine.evaluate()
    assert ev["eval_samples"] == reader.num_samples()


def test_joint_config_guards():
    """inverse_joint_train requires turn experts and an even batch size."""
    with pytest.raises(AssertionError):
        VOTrainConfig(batch_size=15, action_type=(TURN_LEFT, TURN_RIGHT),
                      geo_invariance_types=("inverse_joint_train",))
    with pytest.raises(AssertionError):
        VOTrainConfig(batch_size=16, action_type=-1,
                      geo_invariance_types=("inverse_joint_train",))


def test_joint_pair_guard_masks_malformed():
    """A batch whose rows do NOT alternate (primary, swapped) must not feed
    the inverse loss with unrelated pairs: malformed pairs are masked + counted."""
    icfg = _small_icfg()
    tcfg = VOTrainConfig(
        batch_size=8, epochs=1, action_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",), log_interval=1,
    )
    engine = _fast_engine(icfg, tcfg, None)
    rng = np.random.default_rng(0)
    base = {
        "prev_rgb": jnp.asarray(rng.uniform(0, 255, (8, H, W, 3)), jnp.float32),
        "cur_rgb": jnp.asarray(rng.uniform(0, 255, (8, H, W, 3)), jnp.float32),
        "prev_depth": jnp.asarray(rng.uniform(0, 1, (8, H, W, 1)), jnp.float32),
        "cur_depth": jnp.asarray(rng.uniform(0, 1, (8, H, W, 1)), jnp.float32),
        "actions": jnp.asarray(np.tile([TURN_LEFT, TURN_RIGHT], 4), jnp.int32),
        "gt_delta": jnp.asarray(rng.normal(0, 0.1, (8, 3)), jnp.float32),
        "dz_mask": jnp.ones((8,), jnp.float32),
        "valid": jnp.ones((8,), jnp.float32),
    }
    good = dict(base, data_types=jnp.asarray(np.tile([0, 1], 4), jnp.int32))
    bad = dict(base, data_types=jnp.zeros((8,), jnp.int32))
    rng_key = jax.random.PRNGKey(0)
    _, _, m_good = engine._train_step(
        jax.tree.map(jnp.copy, engine.variables),
        jax.tree.map(jnp.copy, engine.opt_state), good, rng_key)
    _, _, m_bad = engine._train_step(
        jax.tree.map(jnp.copy, engine.variables),
        jax.tree.map(jnp.copy, engine.opt_state), bad, rng_key)
    assert float(m_good["geo/malformed_pairs"]) == 0.0
    assert float(m_bad["geo/malformed_pairs"]) == 4.0
    # the masked inverse loss contributes nothing on the malformed batch
    assert float(m_bad["geo/abs_diff_rot"]) == 0.0


def test_joint_turn_engine_with_geo_loss(dataset_path):
    """Stage-2 style: left/right experts jointly trained with the inverse
    loss; the GT debug invariance stays ~0 (engine:510-535)."""
    tcfg = VOTrainConfig(
        batch_size=16, epochs=1, action_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",), lr=1.5e-4, log_interval=1,
    )
    reader = FramePairReader(
        dataset_path, W, H, act_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",),
    )
    engine = _fast_engine(_small_icfg(), tcfg, reader)
    assert engine._bucketed_train  # joint stage uses the bucketed fast path
    stats = engine.train_epoch()
    assert np.isfinite(stats["total_loss"])
    assert stats["debug_geo/abs_diff_rot"] < 1e-4
    assert stats["frame_pairs_per_s"] > 0


def test_bucketed_joint_training_mesh_matches_masked(dataset_path):
    """Per-shard local buckets over the virtual 4-device mesh compute the
    same update as the masked all-experts shard_map step."""
    import dataclasses

    from pointnav_vo_tpu.parallel.mesh import make_mesh
    from pointnav_vo_tpu.vo.engine import _batch_to_device

    icfg = dataclasses.replace(_small_icfg(), dropout_p=0.0)
    tcfg = VOTrainConfig(
        batch_size=16, epochs=1, action_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",), lr=1.5e-4,
    )
    reader = FramePairReader(
        dataset_path, W, H, act_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",),
    )
    model = icfg.make_model()
    dummy = {
        "rgb": jnp.zeros((1, H, W, 6)), "depth": jnp.zeros((1, H, W, 2)),
        "discretized_depth": jnp.zeros((1, H, W, 20)),
        "top_down_view": jnp.zeros((1, H, W, 2)),
    }
    per = [fast_init(model, dummy, train=False, seed=i) for i in range(2)]
    engine = VORegressionEngine(icfg, tcfg, reader, mesh=make_mesh(4),
                                init_variables_per_expert=per)
    assert engine._bucketed_train
    batch = next(reader.iter_batches(16, rng=np.random.default_rng(2),
                                     drop_last=True))
    arrs = _batch_to_device(batch)
    arrs_b = engine._attach_train_buckets(arrs, batch)
    assert "bucket_idx_0" in arrs_b  # every 4-sample shard holds 2+2 twins

    key = jax.random.PRNGKey(5)
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    v_ref, _, m_ref = engine._train_step(copy(engine.variables),
                                         copy(engine.opt_state), arrs, key)
    v_fast, _, m_fast = engine._train_step_bucketed(
        copy(engine.variables), copy(engine.opt_state), arrs_b, key)
    np.testing.assert_allclose(float(jnp.asarray(m_fast["total_loss"]).mean()),
                               float(jnp.asarray(m_ref["total_loss"]).mean()),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(v_ref["params"]),
                    jax.tree.leaves(v_fast["params"])):
        # adam's grad/sqrt(v) rescaling amplifies the fp32 reduction-order
        # differences between the two shard_map programs (~0.3% worst-case
        # after one step) — looser than the single-device comparison
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=6e-3)


def test_bucketed_joint_training_matches_masked_path(dataset_path):
    """The per-expert bucketed joint train step computes the same loss and
    parameter update as the masked all-experts design (dropout off so the
    two programs draw no divergent masks)."""
    import dataclasses

    from pointnav_vo_tpu.vo.engine import _batch_to_device

    icfg = dataclasses.replace(_small_icfg(), dropout_p=0.0)
    tcfg = VOTrainConfig(
        batch_size=16, epochs=1, action_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",), lr=1.5e-4,
    )
    reader = FramePairReader(
        dataset_path, W, H, act_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",),
    )
    engine = _fast_engine(icfg, tcfg, reader)
    batch = next(reader.iter_batches(16, rng=np.random.default_rng(1),
                                     drop_last=True))
    arrs = _batch_to_device(batch)
    arrs_bucketed = engine._attach_train_buckets(arrs, batch)
    assert "bucket_idx_0" in arrs_bucketed  # exact B/2 occupancy held

    key = jax.random.PRNGKey(3)
    # _train_step donates its variable/opt buffers: pass fresh copies
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    v_ref, _, m_ref = engine._train_step(copy(engine.variables),
                                         copy(engine.opt_state), arrs, key)
    v_fast, _, m_fast = engine._train_step(copy(engine.variables),
                                           copy(engine.opt_state),
                                           arrs_bucketed, key)
    np.testing.assert_allclose(float(m_fast["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(v_ref["params"]),
                    jax.tree.leaves(v_fast["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(v_ref["batch_stats"]),
                    jax.tree.leaves(v_fast["batch_stats"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_twin_packed_batch_matches_unpacked(dataset_path):
    """A twin-packed batch (entry-level pixels, device-side expansion) must
    train identically to the same batch shipped sample-level."""
    import dataclasses

    from pointnav_vo_tpu.vo.engine import _batch_to_device

    icfg = dataclasses.replace(_small_icfg(), dropout_p=0.0)
    tcfg = VOTrainConfig(
        batch_size=16, epochs=1, action_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",), lr=1.5e-4,
    )
    reader = FramePairReader(
        dataset_path, W, H, act_type=(TURN_LEFT, TURN_RIGHT),
        geo_invariance_types=("inverse_joint_train",),
    )
    engine = _fast_engine(icfg, tcfg, reader)
    batch = next(reader.iter_batches(16, rng=np.random.default_rng(4),
                                     drop_last=True))
    assert batch.twins_packed
    arrs_packed = _batch_to_device(batch)
    assert "entry_prev_rgb" in arrs_packed
    assert arrs_packed["entry_prev_rgb"].dtype == jnp.uint8
    arrs_flat = _batch_to_device(unpack_twins(batch))
    assert "prev_rgb" in arrs_flat

    key = jax.random.PRNGKey(7)
    copy = lambda t: jax.tree.map(jnp.copy, t)  # noqa: E731
    v_a, _, m_a = engine._train_step(copy(engine.variables),
                                     copy(engine.opt_state), arrs_packed, key)
    v_b, _, m_b = engine._train_step(copy(engine.variables),
                                     copy(engine.opt_state), arrs_flat, key)
    np.testing.assert_allclose(float(m_a["total_loss"]),
                               float(m_b["total_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(v_a["params"]),
                    jax.tree.leaves(v_b["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

    # eval step parity on the padded short-batch path
    from pointnav_vo_tpu.vo.engine import pad_batch
    preds_a, diffs_a = engine._eval_step(
        engine.variables, pad_batch(arrs_packed, 32))
    preds_b, diffs_b = engine._eval_step(
        engine.variables, pad_batch(arrs_flat, 32))
    np.testing.assert_allclose(np.asarray(preds_a)[:16],
                               np.asarray(preds_b)[:16], atol=1e-5, rtol=1e-4)
