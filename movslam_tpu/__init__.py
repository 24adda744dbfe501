"""movslam_tpu — a TPU-native motion-vector visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MOV-SLAM
(Terascale-All-sensing-Research-Studio/MOV-SLAM): H.264 motion-vector feature
tracks, an EXPRESS binary descriptor, PnP-RANSAC tracking, and local bundle
adjustment — designed batch-first for the MXU/VPU instead of per-macroblock
CPU loops.
"""

__version__ = "0.1.0"
