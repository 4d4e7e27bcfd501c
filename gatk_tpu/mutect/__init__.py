"""Mutect2 somatic calling (tools/walkers/mutect/ equivalents)."""
