"""Copy-number variation stack (tools/copynumber/ + gcnvkernel equivalents).

TPU-native re-design: the reference runs PyMC/PyTensor ADVI on CPU
(src/main/python/.../gcnvkernel); here the denoising model and the per-interval
copy-number HMM are jax array programs (ADAM on ELBO + lax.scan forward-backward)
that jit onto the TPU.
"""
