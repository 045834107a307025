from iinsvae_tpu.evaluation.viz import cdf_curve, cdf_plot, reduce_latents, visualize_latents
from iinsvae_tpu.evaluation.evaluate import evaluate_semi, evaluate_joint, export_residuals

__all__ = [
    "cdf_curve",
    "cdf_plot",
    "reduce_latents",
    "visualize_latents",
    "evaluate_semi",
    "evaluate_joint",
    "export_residuals",
]
