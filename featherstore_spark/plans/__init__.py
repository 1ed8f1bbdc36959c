"""Pipeline plans: end-to-end materialization + checkpoint/resume."""
