"""jax.distributed control-plane helper (single-process smoke; the real
multi-host path needs multiple processes/hosts — exercised by the
dryrun_multichip sharding instead)."""

from cofhe_tpu.parallel import distributed as dist


def test_init_single_process_noop():
    dist.init(num_processes=1)
    assert dist._initialized


def test_global_mesh_axes():
    dist.init(num_processes=1)
    m = dist.global_mesh()
    assert set(m.axis_names) == {"dp", "tp"}
    assert m.devices.size >= 1


def test_parse_flag():
    assert dist.parse_flag("h:1,4,2") == {
        "coordinator": "h:1", "num_processes": 4, "process_id": 2}
    import pytest

    with pytest.raises(ValueError):
        dist.parse_flag("h:1,4")
