"""Host alignment (seed-and-extend; the BwaMemAligner-class capability)."""
