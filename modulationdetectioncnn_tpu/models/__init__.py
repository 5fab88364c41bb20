from modulationdetectioncnn_tpu.models.vtcnn2 import VTCNN2  # noqa: F401
