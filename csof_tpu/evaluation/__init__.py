"""Evaluation: confusion/surface metrics, folder evaluator, postprocessing."""
