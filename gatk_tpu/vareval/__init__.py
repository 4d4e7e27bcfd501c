"""VariantEval stratifier x evaluator framework
(tools/walkers/varianteval/ equivalent)."""
