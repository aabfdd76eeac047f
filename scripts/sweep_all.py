"""Standing-gate attestation: build every degenerate-corpus fixture
and run the full-registry selfcheck against each.

Reuses the fixture bodies from tests/test_empty_corpus.py (via
``__wrapped__``) so the sweep specs cannot drift from the per-commit
pins. Each sweep is a full 327-query Spark-vs-DuckDB value compare;
expect ~6-13 min per fixture depending on load. Results land in
/tmp/sweeps_r9-style dirs plus a per-fixture log.

Usage: python scripts/sweep_all.py [outdir]   (default /tmp/sweeps)
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import test_empty_corpus as T  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweeps"


class _Fac:
    def mktemp(self, tag: str) -> pathlib.Path:
        return pathlib.Path(tempfile.mkdtemp(prefix=tag + "_", dir=OUT))


FIXTURES = [
    ("EMPTY", T.empty_dir),
    ("ONEROW", T.one_row_dir),
    ("NULLPAYLOAD", T.null_payload_dir),
    ("NULLKEYS", T.null_keys_dir),
    ("NANVAL", T.nan_value_dir),
    ("DUPEV", T.dup_events_dir),
    ("UNICODE", T.unicode_dir),
    ("TIME", T.bad_clock_dir),
    ("JSONBAD", T.bad_json_dir),
    ("ADVFLOAT", T.adv_float_dir),
    ("GROUPKEY", T.group_key_dir),
    ("ZEROVAR", T.zero_var_dir),
    ("CAPGROUP", T.cap_group_dir),  # round 10: 2e6-row all-cap group
    ("JSONADV", T.json_adv_dir),    # round 10: adversarial valid props
    ("HIGHCARD", T.high_card_dir),  # round 10: every row its own key
    ("TIES", T.tied_clock_dir),     # round 10: every event same instant
    ("MULTIFILE", T.multi_file_dir),  # round 10: 4-part-file tables
    ("ONEGROUP", T.one_group_dir),  # round 10: every row the same key
    ("GIANTDOC", T.giant_doc_dir),  # round 11: megabyte documents
    ("EMBADV", T.emb_adv_dir),      # round 11: garbage-component vectors
    ("UNIADV", T.uniadv_dir),       # round 12: hostile unicode text
    ("JSONNEST", T.jsonnest_dir),   # round 12: deep-nested props JSON
    ("MAXDUP", T.maxdup_dir),       # round 12: maximal duplication
    ("DOCKEY", T.dockey_dir),       # round 12: adversarial doc identity
    ("VECKEY", T.veckey_dir),       # round 12: adversarial vec identity
    ("USERKEY", T.userkey_dir),     # round 12: adversarial user identity
    ("CATKEY", T.catkey_dir),       # round 12: hostile category values
    ("TIMEADV", T.timeadv_dir),     # round 13: adversarial time
    ("STRADV", T.stradv_dir),       # round 13: hostile relational text
    ("INTADV", T.intadv_dir),       # round 13: hostile integer domains
]


#: Session-environment variants run against the PLAIN sf0.001 corpus
#: (not a degenerate fixture): the host-timezone gate proves
#: load_table's self-provisioned UTC pin under the driver's bare
#: session on a shifted host (witnessed closed in round 10; standing
#: so it cannot silently regress).
ENV_VARIANTS = [
    ("TZSHIFT", "/root/testdata/sf0.001",
     {"TZ": "America/New_York", "SPARK_GRAFT_VANILLA": "1"}),
]


def main() -> int:
    os.makedirs(OUT, exist_ok=True)
    fac = _Fac()
    total_fails = 0
    runs = [
        (name, (fx.__wrapped__ if hasattr(fx, "__wrapped__") else fx)(fac),
         None)
        for name, fx in FIXTURES
    ] + [(name, d, env) for name, d, env in ENV_VARIANTS]
    for name, d, env in runs:
        log = os.path.join(OUT, f"{name}.txt")
        # Keep stderr IN the log and treat a crashed/truncated selfcheck
        # as a failure: a subprocess that dies before printing (Spark
        # startup failure, import error, OOM kill) must not read as a
        # green sweep (ADVICE r9, medium). A healthy run always ends
        # with the 'N failures / M queries' summary line.
        with open(log, "w") as f:
            proc = subprocess.run(
                [sys.executable, "scripts/selfcheck.py", str(d)],
                cwd=REPO, stdout=f, stderr=subprocess.STDOUT,
                env={**os.environ, **env} if env else None,
            )
        lines = open(log).read().strip().splitlines()
        fails = sum(1 for line in lines if line.startswith("FAIL"))
        tail = lines[-1] if lines else "NO OUTPUT"
        crashed = proc.returncode != 0 or "failures /" not in tail
        if crashed and fails == 0:
            fails = 1
            tail = f"CRASHED (exit {proc.returncode}): {tail[:200]}"
        total_fails += fails
        print(f"{name}: {fails} failures — {tail}", flush=True)
    print(f"DONE: {total_fails} total failures across {len(runs)} sweeps")
    return 1 if total_fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
