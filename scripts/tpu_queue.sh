#!/bin/bash
# On-chip measurement queue (run when the axon tunnel is up; each step
# logs to /tmp/q_*.log). All round-5 items are DONE (2026-08-21 session,
# after the critical-path kernel changes: recovery 15/15 in 87 s, GOF
# battery ALL PASS incl. the new btrd_nat_h4/early-exit-gamma cases,
# headline bench 1.87-2.07M — see CHANGELOG). This file stays as the
# re-verification recipe: run it after any sampler/kernel change or
# tunnel outage to re-certify the three on-chip invariants.
#
#  1. recovery spot-check of run_residues on a heterogeneous workload
#  2. device PRNG GOF battery (hardware-PRNG path re-certification)
#  3. headline bench (regression guards built in)
#
# Steps are independent logs so a tunnel drop mid-queue loses one step,
# not the session.
set -x
cd "$(dirname "$0")/.."

timeout 1800 python - <<'EOF' 2>&1 | tee /tmp/q_recovery.log
import numpy as np, time
from basicrta_tpu import GibbsConfig
from basicrta_tpu.ops import simulate_hyperexp
from basicrta_tpu.ops.surv import discretize_times
from basicrta_tpu.sampler.batch import run_residues

rng = np.random.default_rng(3)
residues = {}
for i, n in enumerate([300, 800, 1500, 2500, 4000, 7000, 12000, 20000,
                       500, 900, 3000, 6000, 1100, 250, 15000]):
    residues[f'R{i}'] = discretize_times(
        simulate_hyperexp(n, [0.75, 0.2, 0.05], [3.0, 0.3, 0.03], rng), 0.1)
cfg = GibbsConfig(ncomp=8, niter=11000, g=100, burnin=1000, gmm_n_init=16)
t0 = time.time()
out = run_residues(residues, cfg, engine='pallas')
print(f'ran {len(out)} residues in {time.time()-t0:.1f}s')
ok = 0
for name, (w, r) in out.items():
    rmin = np.sort(r[0][10:], axis=-1)[:, 0]
    med = np.median(rmin[rmin > 0]) if (rmin > 0).any() else np.nan
    ok += 0.01 < med < 0.09
print(f'recovery: {ok}/{len(out)} (expect 15/15)')
EOF

timeout 3600 python scripts/device_prng.py 2>&1 | tee /tmp/q_prng.log

timeout 3600 python bench.py 2>&1 | tee /tmp/q_bench.log

echo "QUEUE DONE — expect recovery 15/15, GOF ALL PASS, bench >= 1.55M."
