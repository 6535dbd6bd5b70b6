"""Host-side utilities: NIfTI IO, pickle/json helpers, logging."""
