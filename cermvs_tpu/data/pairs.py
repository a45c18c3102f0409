"""MVSNet-style ``pair.txt`` parsing and neighbor selection.

Format parity with ``/root/reference/utils/data_utils.py:37-55``; the
BFS-style neighbor backfill reproduces ``datasets/dtu.py:213-241`` /
``datasets/tnt.py:38-60`` for views whose pair lists run short.
"""

from __future__ import annotations

from typing import Dict, List


def load_pair(path) -> Dict:
    """Parse pair.txt -> {img_id: {'id', 'index', 'pair', 'score'},
    'id_list': [...]} (same structure as the reference)."""
    with open(path) as f:
        lines = f.readlines()
    n_cam = int(lines[0])
    pairs: Dict = {}
    img_ids: List[int] = []
    for i in range(1, 1 + 2 * n_cam, 2):
        img_id = int(lines[i].strip())
        tokens = lines[i + 1].strip().split(" ")
        n_pair = int(tokens[0])
        pair = [int(tokens[j]) for j in range(1, 1 + 2 * n_pair, 2)]
        score = [float(tokens[j + 1]) for j in range(1, 1 + 2 * n_pair, 2)]
        img_ids.append(img_id)
        pairs[img_id] = {"id": img_id, "index": i // 2, "pair": pair,
                         "score": score}
    pairs["id_list"] = img_ids
    return pairs


def backfill_neighbors(pair_list: Dict, ref_id: int, num_frames: int) -> List[int]:
    """Take the top-``num_frames`` neighbors; when the list is short, walk the
    neighbors' own pair lists breadth-first (goal-th best of each) until full."""
    base = pair_list[ref_id]["pair"]
    if len(base) >= num_frames:
        return list(base[:num_frames])
    neighbors = list(base)
    head = 0
    goal = 0
    while len(neighbors) < num_frames:
        if head < len(neighbors):
            cand_list = pair_list[neighbors[head]]["pair"]
            if len(cand_list) > goal:
                new_f = cand_list[goal]
            else:
                break
        else:
            head = 0
            goal += 1
            continue
        if new_f not in neighbors and new_f != ref_id:
            neighbors.append(new_f)
        head += 1
    return neighbors


def window_neighbors(id_list: List[int], index: int, num_frames: int) -> List[int]:
    """Fallback for empty pair lists: a sliding window around the reference
    (``datasets/tnt.py:42-44``)."""
    min_ind = max(0, index - num_frames // 2)
    return [
        id_list[x]
        for x in range(min_ind, min(min_ind + num_frames + 1, len(id_list)))
        if x != index
    ]
