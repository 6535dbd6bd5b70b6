"""Interop with reference (torch) checkpoints."""
