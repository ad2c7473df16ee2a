"""Multi-host execution: 2 localhost jax.distributed processes run the
full FASTQ->BAM workflow on a global (data, shard) mesh; the BAM must be
byte-identical to a single-process run (scripts/multihost_dryrun.py)."""

import subprocess
import sys
from pathlib import Path


def test_multihost_dryrun_byte_identical():
    script = Path(__file__).parent.parent / "scripts" / "multihost_dryrun.py"
    proc = subprocess.run([sys.executable, str(script)], timeout=900,
                          capture_output=True, text=True)
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")
    assert "byte-identical" in proc.stdout
