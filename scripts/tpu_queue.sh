#!/bin/bash
# On-chip measurement queue for the late-round-3 changes (run when the
# axon tunnel is up; each step logs to /tmp/q_*.log).
#
#  1. interleaved A/B of the accept-test forms and bucket layouts
#  2. device PRNG GOF battery incl. the btrd / btrd_nat modes
#  3. (manual) flip the pallas early_exit default to the A/B winner
#  4. headline bench
#
# Steps are independent logs so a tunnel drop mid-queue loses one step,
# not the session.
set -x
cd "$(dirname "$0")/.."

timeout 5400 python scripts/abench.py \
  --variants base,btrd,btrd_sl,btrd_nat,btrd_nat_sl,tree,tree_sl,mixed,uniform \
  2>&1 | tee /tmp/q_abench.log

timeout 3600 python scripts/device_prng.py 2>&1 | tee /tmp/q_prng.log

# contacts A/B: adaptive prefilter cap vs pinned static vs dense
timeout 1800 python scripts/cbench.py 2>&1 | tee /tmp/q_cbench.log

# safety capture: a headline number with the CURRENT default, so a
# brief unattended tunnel window still records a bench even before any
# default flip
timeout 3600 python bench.py 2>&1 | tee /tmp/q_bench.log

echo "QUEUE DONE — review /tmp/q_abench.log and /tmp/q_prng.log, flip the"
echo "segment_pallas early_exit default if a btrd form wins, then rerun"
echo "python bench.py (pre-flip number is in /tmp/q_bench.log)."
