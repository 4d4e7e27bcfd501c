"""Multi-device sharding tests on the virtual 8-device CPU mesh (the reference's
Spark local-mode equivalence tests, SURVEY §4.4)."""
import numpy as np

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = np.asarray(fn(*args))
    assert out.shape[0] == 1
    assert np.isfinite(out).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


def test_sharded_matches_single_device():
    import jax

    from gatk_tpu.parallel import mesh as pmesh

    packed, rp, hmax = graft._example_batch(n_pairs=256)
    packed = pmesh.pad_pairs_to_devices(packed, packed["rbase"].shape[1], 8)
    interpret = jax.default_backend() == "cpu"
    mesh8 = pmesh.make_mesh(8)
    out8 = np.asarray(pmesh.pairhmm_sharded(mesh8, packed, rp, hmax, interpret=interpret))
    mesh1 = pmesh.make_mesh(1)
    out1 = np.asarray(pmesh.pairhmm_sharded(mesh1, packed, rp, hmax, interpret=interpret))
    np.testing.assert_allclose(out8, out1, atol=1e-6)
