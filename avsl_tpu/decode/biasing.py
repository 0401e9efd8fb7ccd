"""Contextual biasing (hotword / phrase boosting) inside the jit.

Production ASR serving boosts user-supplied phrases — names, jargon,
product terms — that the acoustic model under-weighs. The reference has
no equivalent (its only decode knobs are HF ``generate`` beam params,
whisper_ft.py:119-121); this is a beyond-parity serving capability.

Design (TPU-first): the phrase set compiles to a token-level trie whose
failure arcs point back through the root, stored as ONE dense transition
table ``next_node[N, V]`` plus a per-node accumulated-bonus potential
``bonus[N]``. Per decode step and per sequence the whole vocabulary's
score adjustment is a single row gather + subtract:

    adj[v] = bonus[next_node[state, v]] - bonus[state]

which is exactly shallow fusion over a weighted automaton in potential
form: extending a live match earns ``+weight`` per token, abandoning a
partial match refunds everything earned past the deepest COMPLETED
phrase on the current path (no free boost for prefixes of phrases that
never complete, but a completed shorter phrase nested inside a longer
one keeps its bonus — the ``banked[N]`` refund floor), and completing a
phrase keeps the full ``weight * len(phrase)``. EOT cannot appear
inside a phrase, so ``next_node[s, eot] = root`` and the potential
difference automatically refunds the un-banked part of any half-matched
phrase when a sequence finishes. The state per beam/sequence is one
int32; advancing it is the same gathered row. Failure arcs are
identified in-jit without an extra table: a match transition is the
unique arc whose destination depth is ``depth[state] + 1`` (failure
arcs land at depth <= 1, and from the root ``banked == 0`` makes the
ambiguity harmless).

The table is host-built once (``build_biasing_trie``) and rides into the
decode program as a constant: ``N * V * 4`` bytes — a few MB for tens of
phrases at Whisper's 51k vocab, negligible against the KV cache.
"""

from __future__ import annotations

from typing import Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np


class BiasingTrie(flax.struct.PyTreeNode):
    next_node: jnp.ndarray  # [N, V] int32 — transition incl. failure arcs
    bonus: jnp.ndarray  # [N] float32 — accumulated bonus potential
    reset: jnp.ndarray  # [N] bool — leaf phrase ends: bank bonus, go root
    banked: jnp.ndarray  # [N] float32 — refund floor: deepest completed
    #   phrase end on the path to this node, times weight (0 if none)
    depth: jnp.ndarray  # [N] int32 — trie depth (root = 0)

    @property
    def n_nodes(self) -> int:
        return self.next_node.shape[0]


def build_biasing_trie(
    phrases: Sequence[Sequence[int]],
    vocab_size: int,
    weight: float = 4.0,
) -> BiasingTrie:
    """Compile token-id phrases into a :class:`BiasingTrie`.

    ``weight`` is the per-token log-prob bonus while a phrase is being
    matched (a completed phrase of length L nets ``weight * L``).
    Phrases that are prefixes of other phrases keep matching past their
    end (interior ends do not reset), and their bonus is BANKED: if the
    longer match is later abandoned — including via EOT — the refund
    only reaches down to the deepest completed phrase end on the path,
    so ``New York`` keeps its boost even when ``New York City`` never
    completes. Equal phrases dedupe.
    """
    if not phrases:
        raise ValueError("no phrases")
    w = float(weight)
    if w <= 0:
        raise ValueError(f"weight must be > 0, got {weight}")
    # children[node] : {token -> node}
    children: list[dict] = [{}]
    depth = [0]
    is_end = [False]
    for ph in phrases:
        ph = [int(t) for t in ph]
        if not ph:
            continue
        if any(t < 0 or t >= vocab_size for t in ph):
            raise ValueError(f"phrase token out of range: {ph}")
        node = 0
        for tok in ph:
            nxt = children[node].get(tok)
            if nxt is None:
                nxt = len(children)
                children.append({})
                depth.append(depth[node] + 1)
                is_end.append(False)
                children[node][tok] = nxt
            node = nxt
        is_end[node] = True

    n = len(children)
    # failure arcs collapse to "restart at root": next(s, v) = child(s, v)
    # if it exists, else child(root, v) if it exists, else root. (Root
    # restart keeps overlapping-suffix matches only when they are also
    # phrase PREFIXES — the common hotword case; full Aho-Corasick
    # suffix links would also catch mid-phrase overlaps at the cost of a
    # bonus potential that is no longer the plain depth.)
    root_row = np.zeros((vocab_size,), np.int32)
    for tok, nxt in children[0].items():
        root_row[tok] = nxt
    table = np.tile(root_row, (n, 1))
    for s in range(n):
        for tok, nxt in children[s].items():
            table[s, tok] = nxt
    bonus = np.asarray(depth, np.float32) * w
    # leaf ends reset to root with the bonus banked; interior ends keep
    # matching the longer phrase (see docstring)
    reset = np.asarray(
        [is_end[s] and not children[s] for s in range(n)], bool
    )
    # banked[s]: bonus of the deepest completed phrase end on the unique
    # root->s path — the refund floor for abandonment past an interior
    # end. BFS carrying the running floor (root has none).
    banked = np.zeros((n,), np.float32)
    frontier = [(0, 0.0)]
    while frontier:
        node, floor = frontier.pop()
        if is_end[node]:
            floor = bonus[node]
        banked[node] = floor
        frontier.extend((c, floor) for c in children[node].values())
    return BiasingTrie(
        next_node=jnp.asarray(table),
        bonus=jnp.asarray(bonus),
        reset=jnp.asarray(reset),
        banked=jnp.asarray(banked),
        depth=jnp.asarray(depth, np.int32),
    )


def bias_adjust(trie: BiasingTrie, state: jnp.ndarray) -> jnp.ndarray:
    """Vocabulary-wide score adjustment for each sequence.

    ``state`` int32 [...] -> adj float32 [..., V]; add to the log-probs
    before argmax/top-k.

    Failure arcs (abandonment, restarts, EOT) refund only down to the
    banked floor: ``adj = bonus[next] - bonus[state] + banked[state]``.
    A transition is a failure arc iff its destination depth is not
    ``depth[state] + 1`` (match arcs always descend one level; failure
    arcs land at the root or a root child, depth <= 1 — only the root
    has depth+1 == 1, and its banked floor is 0).
    """
    row = trie.next_node[state]  # [..., V]
    adj = trie.bonus[row] - trie.bonus[state][..., None]
    failed = trie.depth[row] != trie.depth[state][..., None] + 1
    return adj + trie.banked[state][..., None] * failed


def bias_advance(
    trie: BiasingTrie, state: jnp.ndarray, token: jnp.ndarray
) -> jnp.ndarray:
    """Next automaton state after emitting ``token``; leaf phrase ends
    bank their bonus and return to the root."""
    nxt = jnp.take_along_axis(
        trie.next_node[state], token[..., None], axis=-1
    )[..., 0]
    return jnp.where(trie.reset[nxt], 0, nxt)


def encode_phrases(tokenizer, phrases: Sequence[str]) -> list:
    """Tokenize boost phrases for :func:`build_biasing_trie`.

    Whisper BPE is whitespace-sensitive: mid-sentence words carry a
    leading-space marker. Each phrase is encoded both bare and with a
    leading space so it matches at either position.
    """
    out = []
    for p in phrases:
        p = p.strip()
        if not p:
            continue
        for form in (p, " " + p):
            ids = tokenizer.encode(form)
            if ids:
                out.append(ids)
    if not out:
        raise ValueError("no non-empty boost phrases")
    return out
