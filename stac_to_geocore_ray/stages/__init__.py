"""Ray Data stages: batch transform functions and actor-pool classes."""
