import os, socket, subprocess, sys
script = sys.argv[1]
s = socket.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]; s.close()
procs = []
for pid in range(2):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["SGT_MH_PID"] = str(pid)
    env["SGT_MH_COORD"] = f"127.0.0.1:{port}"
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    procs.append(subprocess.Popen([sys.executable, script], env=env,
                                  stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
for pid, p in enumerate(procs):
    out, _ = p.communicate(timeout=600)
    print(f"===== child {pid} rc={p.returncode} =====")
    print(out[-4000:])
