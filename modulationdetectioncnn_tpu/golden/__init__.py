from modulationdetectioncnn_tpu.golden.cnn import vtcnn2_forward  # noqa: F401
