"""Offline data plane (convert/crop/analyze/plan/preprocess) + online loaders."""
