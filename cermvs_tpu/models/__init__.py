from cermvs_tpu.models.extractor import BasicEncoder, ResidualBlock
from cermvs_tpu.models.raft import RAFT
from cermvs_tpu.models.update import ConvGRU, UpdateBlock
