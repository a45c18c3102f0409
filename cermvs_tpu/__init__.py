"""CER-MVS-TPU: a TPU-native multi-view stereo framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
princeton-vl/CER-MVS (cascaded epipolar RAFT for multi-view depth estimation
plus multi-resolution merge and point-cloud fusion).
"""

__version__ = "0.1.0"
