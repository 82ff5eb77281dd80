"""Structured Streaming: micro-batch harness, sinks, reference topologies."""
