"""GVCF machinery: banding writer, combining, joint genotyping.

Reference behavior: utils/variant/writers/GVCFWriter.java,
tools/walkers/{CombineGVCFs,GenotypeGVCFs}.java,
ReferenceConfidenceVariantContextMerger.java.
"""
