"""Training stack: optimizer groups, schedules, sharded step, stabilization."""
