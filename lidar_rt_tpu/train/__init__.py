"""Training layer: losses, optimizer schedules, density control, the driver.

- losses:    masked loss primitives + the 5-term render loss
- optim:     per-group Adam + exponential xyz LR schedule (optax)
- density:   masked clone/split/prune adaptive density control
- loop:      the training driver (train.py equivalent)
"""
