from cermvs_tpu.io.pfm import read_pfm, write_pfm
from cermvs_tpu.io.ply import read_ply, write_ply


def read_pfm_fast(path):
    """PFM read via the native C++ codec when available (data-path hot loop),
    falling back to the python implementation."""
    from cermvs_tpu.io import native

    if native.available():
        return native.read_pfm(path)
    return read_pfm(path)
