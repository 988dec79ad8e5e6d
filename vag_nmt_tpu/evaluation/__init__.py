from vag_nmt_tpu.evaluation.bleu import corpus_bleu, BleuResult  # noqa: F401
from vag_nmt_tpu.evaluation.meteor import meteor_score  # noqa: F401
from vag_nmt_tpu.evaluation.retrieval import retrieval_recall  # noqa: F401
