"""Setup-node checkpoint/resume: a restarted setup node restores keys,
shares and membership, so existing ciphertexts stay decryptable."""

import os

import pytest

from cofhe_tpu.node.handlers import SetupNodeHandler
from cofhe_tpu.node.network_details import CryptoSystemDetails, NodeDetails, NodeType


@pytest.fixture
def env_toy(toy_hsm):
    os.environ["COFHE_P_OVERRIDE"] = hex(toy_hsm.p)
    from cofhe_tpu.core import cl_hsm2k

    cl_hsm2k._cached_params.cache_clear()
    yield
    del os.environ["COFHE_P_OVERRIDE"]
    cl_hsm2k._cached_params.cache_clear()


def test_checkpoint_resume(env_toy, tmp_path):
    state = str(tmp_path / "setup_state.json")
    self_node = NodeDetails("127.0.0.1", "9999", NodeType.SETUP_NODE)
    cd = CryptoSystemDetails("CoFHE_TPU", "", 128, 32, 2, 3)
    h1 = SetupNodeHandler(self_node, cd, state_path=state)
    # simulate two joins
    from cofhe_tpu.node import wire

    h1._handle_join(wire.JoinAsNodeRequest(wire.JoinType.JOIN_AS_COFHE_NODE, "1.2.3.4", "1"))
    h1._handle_join(wire.JoinAsNodeRequest(wire.JoinType.JOIN_AS_COMPUTE_NODE, "1.2.3.4", "2"))
    ct = h1.cs.encrypt(h1.pk, 1234)

    # "restart": new handler, same state file
    cd2 = CryptoSystemDetails("CoFHE_TPU", "", 128, 32, 2, 3)
    h2 = SetupNodeHandler(self_node, cd2, state_path=state)
    assert h2.sk == h1.sk
    assert h2.pk == h1.pk
    assert h2.rank_shares == h1.rank_shares
    assert h2._next_party == 1
    assert len(h2.nodes) == 3
    assert h2.cs.decrypt(h2.sk, ct) == 1234


def test_checkpoint_param_mismatch(env_toy, tmp_path):
    state = str(tmp_path / "setup_state.json")
    self_node = NodeDetails("127.0.0.1", "9999", NodeType.SETUP_NODE)
    SetupNodeHandler(self_node, CryptoSystemDetails("CoFHE_TPU", "", 128, 32, 2, 3),
                     state_path=state)
    with pytest.raises(ValueError):
        SetupNodeHandler(self_node, CryptoSystemDetails("CoFHE_TPU", "", 128, 32, 2, 4),
                         state_path=state)
