from slowfast_vos_tpu.eval.metrics import jaccard, boundary_f_measure, db_statistics  # noqa: F401
from slowfast_vos_tpu.eval.scorer import DavisScorer  # noqa: F401
from slowfast_vos_tpu.eval.glue import davis_evaluation, extract_masks  # noqa: F401
