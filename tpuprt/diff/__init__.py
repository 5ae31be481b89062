"""Differentiable-rendering estimators beyond detached-sampling AD."""
