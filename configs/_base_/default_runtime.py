# Runtime defaults (the reference's _base_/default_runtime.py equivalent).
log_interval = 50
checkpoint_interval_epochs = 1
seed = 0
