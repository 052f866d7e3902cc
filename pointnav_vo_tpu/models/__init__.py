from pointnav_vo_tpu.models import resnet, running_mean_var, vo_cnn, policy  # noqa: F401
