from traversability_estimation_tpu.utils import rosbag  # noqa: F401
