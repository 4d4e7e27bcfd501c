"""CNN variant scoring (NVScoreVariants / CNNScoreVariants equivalent).

Reference behavior: tools/walkers/vqsr/NVScoreVariants.java +
src/main/python/org/broadinstitute/hellbender/scorevariants/models/gatk_1d.py
(1D CNN over a one-hot reference window + 7 best-practices annotations with a
4-class head: SNP / NOT_SNP / INDEL / NOT_INDEL; score = log-odds of the true
class vs its artifact class, written as the CNN_1D INFO key).

TPU-native redesign: the network is a jitted JAX program (conv via
lax.conv_general_dilated on the MXU) rather than a torch subprocess; training
is optax Adam. Pretrained reference weights ship via git-LFS and are not
redistributable here, so the tool can (a) load a weights .npz or (b) train
on-the-fly against truth resources (a CNN analogue of VQSR training).
"""
from __future__ import annotations

import math

import numpy as np

WINDOW = 128
ANNOTATIONS = ("MQ", "DP", "SOR", "FS", "QD", "MQRankSum", "ReadPosRankSum")
_BASE_IDX = {b: i for i, b in enumerate("ACGT")}


def encode_reference(ref_bases: str) -> np.ndarray:
    """(WINDOW, 4) one-hot reference window."""
    out = np.zeros((WINDOW, 4), np.float32)
    for i, b in enumerate(ref_bases[:WINDOW].upper()):
        j = _BASE_IDX.get(b)
        if j is not None:
            out[i, j] = 1.0
    return out


def encode_annotations(info: dict) -> np.ndarray:
    out = np.zeros(len(ANNOTATIONS), np.float32)
    for i, key in enumerate(ANNOTATIONS):
        try:
            out[i] = float(str(info.get(key, 0)).split(",")[0])
        except ValueError:
            out[i] = 0.0
    return out


# ---------------------------------------------------------------------------
# model (pure jax param pytree)
# ---------------------------------------------------------------------------

def init_params(rng_seed=7, channels=(64, 64), kernel=12, dense=40):
    rng = np.random.default_rng(rng_seed)

    def glorot(shape, fan_in, fan_out):
        lim = math.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-lim, lim, size=shape).astype(np.float32)

    c1, c2 = channels
    params = {
        "conv1_w": glorot((kernel, 4, c1), kernel * 4, c1),
        "conv1_b": np.zeros(c1, np.float32),
        "conv2_w": glorot((kernel, c1, c2), kernel * c1, c2),
        "conv2_b": np.zeros(c2, np.float32),
        "ann_w": glorot((len(ANNOTATIONS), dense), len(ANNOTATIONS), dense),
        "ann_b": np.zeros(dense, np.float32),
        "ann_mean": np.zeros(len(ANNOTATIONS), np.float32),
        "ann_std": np.ones(len(ANNOTATIONS), np.float32),
        "head1_w": glorot((c2 + dense, dense), c2 + dense, dense),
        "head1_b": np.zeros(dense, np.float32),
        "head2_w": glorot((dense + len(ANNOTATIONS), 4), dense, 4),
        "head2_b": np.zeros(4, np.float32),
    }
    return params


def forward(params, ref_onehot, annotations):
    """Logits (N, 4): [SNP, NOT_SNP, INDEL, NOT_INDEL]."""
    import jax.numpy as jnp
    from jax import lax, nn

    x = jnp.asarray(ref_onehot)  # (N, W, 4)
    a = (jnp.asarray(annotations) - params["ann_mean"]) / params["ann_std"]

    def conv(x, w, b):
        y = lax.conv_general_dilated(
            x, jnp.asarray(w), window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return nn.relu(y + b)

    h = conv(x, params["conv1_w"], params["conv1_b"])
    h = conv(h, params["conv2_w"], params["conv2_b"])
    h = h.max(axis=1)  # global max pool over positions -> (N, C)
    ann = nn.relu(a @ params["ann_w"] + params["ann_b"])
    z = jnp.concatenate([h, ann], axis=-1)
    z = nn.relu(z @ params["head1_w"] + params["head1_b"])
    z = jnp.concatenate([z, a], axis=-1)
    return z @ params["head2_w"] + params["head2_b"]


def train(params, ref_onehot, annotations, labels, epochs=40, batch=64,
          learning_rate=1e-3, seed=0):
    """labels: (N,) int in {0: SNP, 1: NOT_SNP, 2: INDEL, 3: NOT_INDEL}."""
    import jax
    import jax.numpy as jnp
    import optax

    ann = np.asarray(annotations, np.float32)
    params = dict(params)
    params["ann_mean"] = ann.mean(axis=0).astype(np.float32)
    params["ann_std"] = np.maximum(ann.std(axis=0), 1e-3).astype(np.float32)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    frozen = {"ann_mean", "ann_std"}

    opt = optax.adam(learning_rate)
    trainable = {k: v for k, v in params.items() if k not in frozen}
    state = opt.init(trainable)

    x_all = jnp.asarray(ref_onehot)
    a_all = jnp.asarray(ann)
    y_all = jnp.asarray(labels)

    def loss_fn(tr, x, a, y):
        p = dict(tr)
        p["ann_mean"] = params["ann_mean"]
        p["ann_std"] = params["ann_std"]
        logits = forward(p, x, a)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    @jax.jit
    def step(tr, st, x, a, y):
        loss, grads = jax.value_and_grad(loss_fn)(tr, x, a, y)
        updates, st = opt.update(grads, st)
        tr = optax.apply_updates(tr, updates)
        return tr, st, loss

    rng = np.random.default_rng(seed)
    n = len(y_all)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n, batch):
            idx = order[i:i + batch]
            trainable, state, _loss = step(trainable, state,
                                           x_all[idx], a_all[idx], y_all[idx])
    out = {k: np.asarray(v) for k, v in trainable.items()}
    out["ann_mean"] = np.asarray(params["ann_mean"])
    out["ann_std"] = np.asarray(params["ann_std"])
    return out


def score(params, ref_onehot, annotations, is_snp):
    """CNN_1D scores: logit(true class) - logit(artifact class) per variant."""
    import jax.numpy as jnp

    logits = np.asarray(forward({k: jnp.asarray(v) for k, v in params.items()},
                                ref_onehot, annotations))
    snp_score = logits[:, 0] - logits[:, 1]
    indel_score = logits[:, 2] - logits[:, 3]
    return np.where(np.asarray(is_snp), snp_score, indel_score)


def save_weights(params, path):
    np.savez_compressed(path, **params)


def load_weights(path):
    z = np.load(path)
    return {k: z[k] for k in z.files}
