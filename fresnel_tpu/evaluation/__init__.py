from fresnel_tpu.evaluation.visual_eval import VisualEvaluator, compute_ssim
from fresnel_tpu.evaluation.novel_view_eval import evaluate_novel_views

__all__ = ["VisualEvaluator", "compute_ssim", "evaluate_novel_views"]
