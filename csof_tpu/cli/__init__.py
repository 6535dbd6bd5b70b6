"""Console entry points (the reference's 18 nnUNet_* scripts, collapsed)."""
