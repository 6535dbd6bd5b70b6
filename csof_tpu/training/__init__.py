"""Training runtime: schedules, train state, trainers, checkpointing."""
