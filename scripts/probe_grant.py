"""One-shot host-grant probe: prints effective_cores at k=32, 16 and 8 plus
the single-thread spin, as one JSON line. File-based with a __main__ guard
(CLAUDE.md round-3 gotcha: effective_cores uses mp spawn and must never be
called from a stdin/heredoc script)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    from bench import effective_cores, host_spin_ms

    ks = [int(a) for a in sys.argv[1:]] or [32, 16, 8]
    out = {f"eff@{k}": effective_cores(k) for k in ks}
    out["spin_ms"] = host_spin_ms()
    print(json.dumps(out))
