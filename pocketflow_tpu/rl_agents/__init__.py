"""RL agents for hyper-parameter search (DDPG / AMC-style)."""
