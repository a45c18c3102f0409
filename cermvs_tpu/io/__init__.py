from cermvs_tpu.io.pfm import read_pfm, write_pfm
from cermvs_tpu.io.ply import read_ply, write_ply
