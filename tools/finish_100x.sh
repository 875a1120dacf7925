#!/bin/bash
# Land the 100x full-suite bench artifact: copy the bench JSON from the
# scratch cwd, print the summary + worst growth rows vs the sf0.1
# artifact (bench_out.json), so SCALING.md's table can be filled.
set -e
cd /root/repo
cp /tmp/bench_cwd/bench_out.json BENCH_SCALING_100x_full.json
python3 - <<'EOF'
import json
d = json.load(open('BENCH_SCALING_100x_full.json'))
q = d['queries']
print('total', d['value'], 'failed', d['failed'], 'n', len(q),
      'excluded', d.get('excluded'))
print('builds', d.get('builds'))
fails = [k for k, v in q.items() if v < 0]
print('failed queries:', fails)
EOF
python3 tools/scaling_report.py bench_out.json BENCH_SCALING_100x_full.json 2 10 | head -40
