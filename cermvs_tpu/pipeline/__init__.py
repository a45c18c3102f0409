from cermvs_tpu.pipeline.fusion import fusion
from cermvs_tpu.pipeline.inference import InferenceRunner, inference
from cermvs_tpu.pipeline.multires import multires
