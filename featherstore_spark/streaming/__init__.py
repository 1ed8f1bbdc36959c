"""Structured Streaming equivalents of the batch operators."""
