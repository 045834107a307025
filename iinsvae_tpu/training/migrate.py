"""Checkpoint key migration: pre-rename param trees -> current names.

The round-2/3 kernel refactors replaced nested flax auto-named modules
with explicit ``self.param`` calls (ROADMAP.md item 0). Orbax checkpoints
written before those commits hold the OLD tree; this module maps them onto
the current one so long-lived checkpoints keep restoring.

Rename map (verified by diffing ``module.init`` trees of the pre-rename
commit against HEAD — see tests/test_migrate.py for the synthesized
old-format roundtrip):

- Linear heads (classifier / restorer subtrees):
    ``Dense_{j}/kernel`` -> ``w{j}``, ``Dense_{j}/bias`` -> ``b{j}``
- ``range_encoder`` subtree (Conv{1,2}d_{j} ordered):
    j=0        -> ``in_kernel``                (bias dropped, see below)
    middle j   -> ``down{j-1}_kernel``         (bias dropped)
    last j     -> ``out_kernel`` / ``out_bias``
    ``ResidualBlock*_{r}/Conv*_{0|1}/kernel`` -> ``res{r}_kernel{1|2}``
- ``env_encoder`` subtree (no norms -> biases kept):
    j<last -> ``ConvINAct_{j}/kernel|bias``
    last j -> ``Conv1d_0|Conv2d_0 / kernel|bias``  (NOTE: the old
      ``Conv1d_0`` and the new ``Conv1d_0`` are DIFFERENT convs — the
      first 7-tap conv vs the final 1x1 cat conv — which is why this
      migration is explicit + shape-checked instead of name pass-through)
- ``decoder`` subtree:
    j=0      -> ``in_kernel`` / ``in_bias``
    middle j -> ``up{j-1}_kernel`` / ``up{j-1}_bias``
    last j   -> ``out_kernel`` / ``out_bias``
    ``SampleLayerNorm_{j}/gamma|beta`` -> ``up{j}_gamma|up{j}_beta``
    ``ResidualBlock*_{r}/Conv*_{0|1}/kernel`` -> ``res{r}_kernel{1|2}``

Dropped biases are mathematically exact no-ops: each sits immediately
before an InstanceNorm / AdaIN whose per-(sample,channel) mean-centering
cancels any per-channel constant, so discarding them preserves the
network function bit-for-bit in f32 (the round-2 refactor removed the
parameters for the same reason).
"""

from __future__ import annotations

import re

import jax
import numpy as np

_DENSE = re.compile(r"^Dense_(\d+)$")
_CONV = re.compile(r"^Conv[123]d_(\d+)$")
_RES = re.compile(r"^ResidualBlock[a-zA-Z0-9]*_(\d+)$")
_SLN = re.compile(r"^SampleLayerNorm_(\d+)$")


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, leaf in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return root


def _conv_indices(keys_in_subtree):
    """Sorted conv indices at one module level (top-level Conv*_N only)."""
    idx = set()
    for path in keys_in_subtree:
        m = _CONV.match(path[0])
        if m:
            idx.add(int(m.group(1)))
    return sorted(idx)


def _map_subtree(kind: str, flat: dict) -> dict:
    """flat: {relative_path_tuple: leaf} within one leaf-module subtree.

    NOTE: only the LINEAR heads and the encoder/decoder stacks were
    renamed by the refactors; conv-type heads (RestorerConv1d etc.) kept
    their flax auto-names. migrate_params therefore applies this mapping
    per-subtree ONLY when the mapped keys match the current template
    better than pass-through does (see _pick below)."""
    out = {}
    convs = _conv_indices(flat)
    lo = convs[0] if convs else None
    hi = convs[-1] if convs else None
    for path, leaf in flat.items():
        head = path[0]
        m = _DENSE.match(head)
        if m and kind in ("heads", "any"):
            j = int(m.group(1))
            out[("w%d" % j,) if path[1] == "kernel" else ("b%d" % j,)] = leaf
            continue
        m = _CONV.match(head)
        if m:
            j = int(m.group(1))
            if kind == "env_encoder":
                if j == hi:
                    # the final cat conv keeps flax auto-naming in the new
                    # tree (it is the only plain nn-conv left) -> index 0
                    out[(head.split("_")[0] + "_0", path[1])] = leaf
                else:
                    out[("ConvINAct_%d" % j, path[1])] = leaf
                continue
            # range_encoder / decoder stacks
            if j == lo:
                name = "in"
            elif j == hi:
                name = "out"
            elif kind == "decoder":
                name = "up%d" % (j - 1)
            else:
                name = "down%d" % (j - 1)
            if path[1] == "kernel":
                out[("%s_kernel" % name,)] = leaf
            elif name in ("in", "out") and kind == "decoder":
                out[("%s_bias" % name,)] = leaf
            elif name == "out" or name.startswith("up"):
                out[("%s_bias" % name,)] = leaf
            # else: bias before an InstanceNorm -> exact no-op, dropped
            continue
        m = _RES.match(head)
        if m:
            r = int(m.group(1))
            mc = _CONV.match(path[1])
            if mc and path[2] == "kernel":
                out[("res%d_kernel%d" % (r, int(mc.group(1)) + 1),)] = leaf
            # res-conv biases precede IN/AdaIN centering -> dropped
            continue
        m = _SLN.match(head)
        if m:
            j = int(m.group(1))
            out[("up%d_%s" % (j, path[1]),)] = leaf
            continue
        out[path] = leaf  # already-new or unrecognized: pass through
    return out


_SUBTREE_KIND = {
    "classifier": "heads",
    "restorer": "heads",
    "range_encoder": "range_encoder",
    "env_encoder": "env_encoder",
    "decoder": "decoder",
}


def migrate_params(old_params, template_params):
    """Map a pre-rename ``params`` tree onto the structure (and shapes) of
    ``template_params`` (a freshly initialized current tree). Raises
    ``ValueError`` listing every unmapped / missing / shape-mismatched key
    rather than restoring a silently-wrong model."""
    old_flat = _flatten(old_params)
    tmpl_flat = _flatten(jax.tree.map(np.asarray, template_params))

    # group by leaf-module subtree: the path prefix up to and including the
    # last component named in _SUBTREE_KIND (e.g. encoder/range_encoder)
    groups: dict = {}
    for path, leaf in old_flat.items():
        cut = 0
        kind = "any"
        for i, comp in enumerate(path):
            if comp in _SUBTREE_KIND:
                cut, kind = i + 1, _SUBTREE_KIND[comp]
        groups.setdefault((path[:cut], kind), {})[path[cut:]] = leaf

    new_flat = {}
    for (prefix, kind), sub in groups.items():
        # per-subtree choice: rename map vs pass-through, scored against
        # the template's keys under this prefix. Conv-type heads (and any
        # module the refactors never renamed) keep their flax auto-names,
        # so pass-through matches them exactly while the rename map would
        # mangle them (e.g. a conv restorer's Conv1d_0 is NOT an
        # in_kernel).
        tmpl_keys = {p[len(prefix):] for p in tmpl_flat if p[:len(prefix)] == prefix}
        mapped = _map_subtree(kind, sub)
        passthrough_score = len(set(sub) & tmpl_keys)
        mapped_score = len(set(mapped) & tmpl_keys)
        chosen = mapped if mapped_score >= passthrough_score else sub
        for rel, leaf in chosen.items():
            new_flat[prefix + rel] = leaf

    errors = []
    for path in new_flat:
        if path not in tmpl_flat:
            errors.append("unmapped old key -> %s" % "/".join(path))
    for path, tleaf in tmpl_flat.items():
        if path not in new_flat:
            errors.append("missing in old checkpoint: %s" % "/".join(path))
        elif tuple(np.shape(new_flat[path])) != tuple(tleaf.shape):
            errors.append(
                "shape mismatch at %s: old %s vs current %s"
                % ("/".join(path), np.shape(new_flat[path]), tleaf.shape)
            )
    if errors:
        raise ValueError(
            "checkpoint migration failed (%d problems):\n  " % len(errors)
            + "\n  ".join(sorted(errors))
        )
    return _unflatten({p: new_flat[p] for p in tmpl_flat})
