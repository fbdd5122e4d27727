"""Guide-tree structure helpers (reference src/tree/TreeDefs.h)."""


def ids_to_uint64(id1: int, id2: int) -> int:
    """Packed deterministic tie-break key (SingleLinkage.h:49-56)."""
    if id1 < 0 or id2 < 0:
        return 0
    if id1 > id2:
        id1, id2 = id2, id1
    return (id1 << 32) + id2


def uint64_to_id(packed: int):
    id1 = packed >> 32
    id2 = packed & 0xFFFFFFFF
    return (id1, id2) if id1 < id2 else (id2, id1)


U64_MASK = 0xFFFFFFFFFFFFFFFF
