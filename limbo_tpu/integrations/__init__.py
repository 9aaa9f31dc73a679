"""External-system integrations (ROS, …).

The BO host loop takes any Python callable as the objective, so
integrations are thin marshalling adapters — the TPU compute path is
untouched.
"""

from limbo_tpu.integrations.ros import RosObjective, make_ros_objective

__all__ = ["RosObjective", "make_ros_objective"]
