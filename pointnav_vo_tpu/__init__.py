"""pointnav_vo_tpu — a TPU-native (JAX/XLA/pjit/Pallas) rebuild of PointNav-VO.

The reference implementation (Xiaoming-Zhao/PointNav-VO, ICCV 2021) solves
GPS/compass-free PointGoal navigation by pairing a supervised visual-odometry
regressor with a DD-PPO navigation policy.  This package provides the same
capabilities designed TPU-first:

- ``ops``      pure-JAX geometry + observation preprocessing (jittable, batched)
- ``models``   flax.linen model zoo (GroupNorm ResNet family, VO CNNs, policy)
- ``vo``       VO ensemble (stacked per-action params), losses, training engine
- ``rl``       rollout storage / GAE / PPO / DD-PPO as jitted device pytrees
- ``parallel`` mesh + collective helpers (data-parallel pjit/shard_map)
- ``io``       PyTorch checkpoint import, orbax-style native checkpoints
- ``config``   typed config trees mirroring the reference yacs layout
- ``utils``    registry, logging, timing

Everything on the compute path is functional and static-shaped so a full
preprocess -> VO -> goal-update -> policy step compiles to a single XLA
program per device.
"""

__version__ = "0.1.0"
