"""CLI multi-process launch detection (cli/train.py).

jax.distributed.initialize() auto-detects its arguments on TPU pods /
Slurm / Open MPI, but the CLI must decide to CALL it — and none of those
launchers set JAX_COORDINATOR_ADDRESS, so a gate on that var alone would
leave a real pod training as N disconnected hosts."""

from shift_gcn_tpu.cli.train import should_init_distributed


def test_single_host_defaults_off():
    assert should_init_distributed(env={}) is False
    # single-task scheduler allocations stay single-process
    assert should_init_distributed(env={"SLURM_NTASKS": "1"}) is False
    assert should_init_distributed(
        env={"OMPI_COMM_WORLD_SIZE": "1"}) is False
    # single-worker TPU hosts export a one-entry roster
    assert should_init_distributed(
        env={"TPU_WORKER_HOSTNAMES": "t1v-n-1"}) is False
    assert should_init_distributed(env={"SLURM_NTASKS": "weird"}) is False


def test_multi_process_launchers_detected():
    assert should_init_distributed(
        env={"JAX_COORDINATOR_ADDRESS": "10.0.0.1:1234"}) is True
    assert should_init_distributed(env={"SLURM_NTASKS": "4"}) is True
    assert should_init_distributed(
        env={"OMPI_COMM_WORLD_SIZE": "2"}) is True
    # multi-worker TPU pod: the runtime exports the full worker roster
    assert should_init_distributed(
        env={"TPU_WORKER_HOSTNAMES": "t1v-n-0,t1v-n-1"}) is True


def test_explicit_override_wins():
    assert should_init_distributed(env={"SGT_DISTRIBUTED": "1"}) is True
    assert should_init_distributed(
        env={"SGT_DISTRIBUTED": "0",
             "JAX_COORDINATOR_ADDRESS": "10.0.0.1:1"}) is False
    assert should_init_distributed(
        env={"SGT_DISTRIBUTED": "false", "SLURM_NTASKS": "8"}) is False
    # every false spelling the lowering config parser accepts
    for spelling in ("off", "no", "False", " 0 "):
        assert should_init_distributed(
            env={"SGT_DISTRIBUTED": spelling}) is False, spelling
