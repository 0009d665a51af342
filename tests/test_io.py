import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vihmc_tpu.io import RunStore, make_uid, save_checkpoint, load_checkpoint, latest_step


def test_make_uid_format():
    uid = make_uid()
    parts = uid.split("_")
    assert len(parts) >= 6  # d_m_Y_H_M_S


def test_runstore_roundtrip(tmp_path):
    store = RunStore(str(tmp_path))
    store.save_array("hmc_params", np.arange(6.0).reshape(2, 3))
    back = store.load_array("hmc_params")
    np.testing.assert_array_equal(back, np.arange(6.0).reshape(2, 3))

    store.save_arrays("bundle", a=np.ones(2), b=np.zeros(3))
    z = store.load_arrays("bundle")
    assert set(z) == {"a", "b"}

    @dataclasses.dataclass(frozen=True)
    class Cfg:
        step_size: float = 1e-4
        loss: str = "NLL"

    store.save_config(Cfg())
    cfg = store.load_config()
    assert cfg["step_size"] == 1e-4 and cfg["loss"] == "NLL"

    store.append_metrics_row([1.0, 2.0, 3.0])
    store.append_metrics_row([4.0, 5.0, 6.0])
    lines = open(store.path + "/output.txt").read().strip().splitlines()
    assert len(lines) == 2

    reopened = RunStore.open(str(tmp_path), store.uid)
    np.testing.assert_array_equal(reopened.load_array("hmc_params"),
                                  np.arange(6.0).reshape(2, 3))
    assert RunStore.list_runs(str(tmp_path)) == [store.uid]


def test_checkpoint_roundtrip(tmp_path):
    state = {"vp": {"mu": jnp.arange(4.0), "rho": -3.0 * jnp.ones(4)},
             "epoch": jnp.asarray(7)}
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state)
    save_checkpoint(d, 12, state)
    assert latest_step(d) == 12
    back = load_checkpoint(d)
    np.testing.assert_allclose(np.asarray(back["vp"]["mu"]), np.arange(4.0))
    back7 = load_checkpoint(d, step=7)
    assert int(np.asarray(back7["epoch"])) == 7
