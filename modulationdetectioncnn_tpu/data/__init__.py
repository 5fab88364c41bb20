from modulationdetectioncnn_tpu.data.synthetic import (  # noqa: F401
    MODULATIONS,
    generate_frames,
    make_dataset,
)
from modulationdetectioncnn_tpu.data.radioml import load_radioml_pickle  # noqa: F401
