"""Shared utilities: visualization, rng helpers."""
