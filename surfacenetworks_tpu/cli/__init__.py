"""Per-task training CLIs (reference argparse surfaces, TPU runtime)."""
