"""Preprocessing: duplicate marking (+ future sorting/merging utilities)."""
