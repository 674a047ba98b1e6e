"""Pipeline plans: round loop, checkpoint/resume, metrics."""
