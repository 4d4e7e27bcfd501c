"""Base quality score recalibration (BQSR).

TPU-native re-design of GATK4's BaseRecalibrator/ApplyBQSR
(tools/walkers/bqsr/, utils/recalibration/): covariate keys are computed as
vectorized array programs and accumulated into dense (readgroup, qual, covariate,
event) histogram tensors by scatter-add — the natural TPU formulation of the
reference's NestedIntegerArray-of-RecalDatum updates.
"""
