from sage_icp_tpu.datasets.kitti import KittiOdometrySequence
from sage_icp_tpu.datasets.kitti360 import Kitti360Sequence
from sage_icp_tpu.datasets.kitti_raw import KittiRawSequence, discover_drives

__all__ = [
    "KittiOdometrySequence",
    "Kitti360Sequence",
    "KittiRawSequence",
    "discover_drives",
]
