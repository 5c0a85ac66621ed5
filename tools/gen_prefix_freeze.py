"""Regenerate the registry's driver-prefix freeze literals.

Run: ``python tools/gen_prefix_freeze.py``. Prints the two structures the
per-round re-freeze needs (see the ROUND-N NOTE in
``ppdb_parser_spark/queries/registry.py``):

- ``_DRIVER_CHECKED_R1_RN`` — union of all committed
  ``CORRECTNESS_r*.json`` keys (queries with at least one driver row);
- ``_LAST_DRIVER_ROUND`` — latest round each query received a row, the
  key tier 3 of ``coverage_order()`` rotates on (oldest first).

Paste the output over the old literals, rename per the NOTE, refresh
``_ROUNDN_PRIORITY`` by hand (conversions + marquee re-certs are a
judgment call), and update the prefix-contract test.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    # Names that were deregistered after earning a row (e.g. the retired
    # ``sim_lsh_pairs``) must NOT survive into the freeze literals — the
    # frozen sets stay an exact subset of the live registry (VERDICT r7
    # item 7).
    sys.path.insert(0, REPO)
    from ppdb_parser_spark.queries.registry import REGISTRY

    last: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r") : -len(".json")])
        rounds.append(rnd)
        for name in json.load(open(path)):
            if name in REGISTRY:
                last[name] = max(last.get(name, 0), rnd)
    hi = max(rounds)
    names = textwrap.fill(
        ", ".join(repr(n) for n in sorted(last)),
        width=72,
        initial_indent="        ",
        subsequent_indent="        ",
    )
    lastmap = textwrap.fill(
        ", ".join(f"{n!r}: {r}" for n, r in sorted(last.items())),
        width=72,
        initial_indent="        ",
        subsequent_indent="        ",
    )
    print(f"_DRIVER_CHECKED_R1_R{hi} = frozenset(\n    {{\n{names}\n    }}\n)")
    print()
    print(f"_LAST_DRIVER_ROUND = {{\n{lastmap}\n}}")


if __name__ == "__main__":
    main()
