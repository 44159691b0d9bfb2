"""Training runtime: optimizer/scheduler, checkpointing, Learner loop."""
