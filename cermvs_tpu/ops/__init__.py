from cermvs_tpu.ops import corr, geometry, sampling
