"""Inference engines: batched sliding-window segmentation + flow prediction."""
