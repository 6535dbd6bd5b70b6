"""Dataset converters (raw vendor layouts -> framework raw layout)."""
