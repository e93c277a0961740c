#!/usr/bin/env bash
# One-shot TPU measurement sweep (run when the axon relay is up; the tunnel
# is single-client, so everything runs serially from this one script).
# Usage: bash scripts/measure_all.sh [outdir]
set -u
cd "$(dirname "$0")/.."
out="${1:-/tmp/measurements_$(date +%H%M%S)}"
mkdir -p "$out"
echo "writing to $out"

probe() {
  python - <<'EOF'
import socket, sys
for port in (8082, 8092, 8102, 8112):
    s = socket.socket(); s.settimeout(1.0)
    try:
        s.connect(("127.0.0.1", port)); sys.exit(0)
    except OSError:
        pass
    finally:
        s.close()
sys.exit(1)
EOF
}
probe || { echo "relay down; aborting"; exit 1; }

run() {  # run <name> <cmd...>
  name="$1"; shift
  echo "=== $name ==="
  timeout 1200 "$@" 2>&1 | tee "$out/$name.log" | tail -5
  probe || { echo "relay died during $name; aborting"; exit 1; }
}

run bench           python bench.py
run device_stages   python scripts/bench_device_stages.py
run sift_stages     python scripts/probe.py sift-stages
run device_1080p    python scripts/bench_1080p.py
run configs         python scripts/bench_configs.py
run datasets        python scripts/bench_datasets.py
run golden          python scripts/compare_golden.py
echo "all logs in $out"
