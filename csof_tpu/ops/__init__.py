"""Pure array ops: the jittable compute core of the framework."""
