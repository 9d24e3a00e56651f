"""Training drivers: optimizers, checkpoints, trainers, rollout."""
