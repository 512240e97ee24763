#!/bin/bash
# Quiet-sample hunter (r14): loop quiet_gate -> bench until a sample is
# BOTH probe-quiet on entry AND clean in hindsight (after-calib gemm
# inside the BASELINE window, bounded steal), or attempts run out.
# Accepted sample stays in bench_last.json; rejected attempts are moved
# aside so they can't be mistaken for the record.
set -u
cd /root/repo
ATTEMPTS=${1:-6}
for i in $(seq 1 "$ATTEMPTS"); do
  echo "=== attempt $i $(date -u +%H:%M:%S)" >&2
  python tools/quiet_gate.py --thresh 0.11 --max-wait 3600 -- python bench.py >/dev/null 2>&1
  rc=$?
  if [ "$rc" -eq 3 ]; then echo "host never quiet; retrying" >&2; continue; fi
  verdict=$(python - <<'EOF'
import json
d = json.load(open("bench_last.json"))
g0 = d["calib"]["before"]["gemm_sec"]; g1 = d["calib"]["after"]["gemm_sec"]
steal = sum(d.get("steal_ticks", {}).values())
ok = g0 < 0.12 and g1 < 0.12 and steal < 2000
print(f"{'ACCEPT' if ok else 'REJECT'} headline={d['value']} gemm={g0}/{g1} steal={steal}")
EOF
)
  echo "$verdict" >&2
  case "$verdict" in
    ACCEPT*) exit 0 ;;
    *) cp bench_last.json "/tmp/bench_rejected_$i.json" ;;
  esac
done
echo "no quiet sample in $ATTEMPTS attempts" >&2
exit 4
