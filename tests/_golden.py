"""Shared helpers for the flattened golden-fixture encoding.

Fixtures (scripts/make_golden.py) store nested parameter trees as flat
npz keys ``<PREFIX>|a|b|c`` (P=params, S=batch stats, G=grads,
F=final/trajectory values). These helpers are the single
decoder — test_golden_parity.py and test_torch_import.py both use
them, so a change to the key encoding lands in one place.
"""


def insert_path(tree, path, value):
    """Insert ``value`` at the ``|``-split ``path`` in nested dicts."""
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def trees_from_flat(data, prefixes):
    """{prefix: nested tree} from a flat mapping of ``P|a|b``-style
    keys, for each requested one-letter prefix."""
    out = {p: {} for p in prefixes}
    for key, value in data.items():
        p = key.split("|", 1)[0]
        if p in out and "|" in key:
            insert_path(out[p], key[len(p) + 1:].split("|"), value)
    return out
