"""VQSR: variant quality score recalibration (GMM over annotation vectors)."""
