import os, socket, subprocess, sys, time
script = sys.argv[1]
deadline = float(sys.argv[2]) if len(sys.argv) > 2 else 300
s = socket.socket(); s.bind(("127.0.0.1", 0)); port = s.getsockname()[1]; s.close()
procs, files = [], []
for pid in range(2):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["SGT_MH_PID"] = str(pid)
    env["SGT_MH_COORD"] = f"127.0.0.1:{port}"
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    f = open(f"/tmp/mh_child{pid}.log", "w")
    files.append(f)
    procs.append(subprocess.Popen([sys.executable, script], env=env,
                                  stdout=f, stderr=subprocess.STDOUT, text=True))
t0 = time.time()
while time.time() - t0 < deadline and any(p.poll() is None for p in procs):
    time.sleep(2)
for p in procs:
    if p.poll() is None:
        print(f"KILLING pid {p.pid} (still running at deadline)")
        p.kill()
        p.wait()
for f in files:
    f.close()
for pid in range(2):
    print(f"===== child {pid} =====")
    print(open(f"/tmp/mh_child{pid}.log").read()[-3000:])
