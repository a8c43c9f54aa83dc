"""Curriculum engine.

Replaces ``utils/curriculum.py:3-60``: the config maps a start iteration to a
list of lessons; each lesson is a list of tags with an optional int
duplication prefix; within a stage, lessons round-robin by
``iteration % len(lessons)``.  The paper GAN cycle is 7 lessons
(``configs/cf_IAMslant_...sMG.json:85-96``):
``count | no-step,gen | auto,auto-gen | disc | no-step,gen | auto,auto-gen |
disc``.

Unlike the reference (which mutates a stack at lookup time,
``curriculum.py:51-55``), stages here are resolved functionally so the same
iteration always maps to the same lesson — a requirement for compiling one
step function per distinct lesson signature.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple


class Curriculum:
    def __init__(self, lesson_desc: Dict[str, List[List]]):
        stages: List[Tuple[int, List[List[str]]]] = []
        self.need_sep_gen_opt = False
        self.need_sep_style_ex_opt = False
        self.need_style_in_disc = False
        self.sample_disc = False
        valid, evals = set(), set()
        for start, lessons in (lesson_desc or {}).items():
            expanded: List[List[str]] = []
            for lesson in lessons:
                dup = 1
                tags: List[str] = []
                for a in lesson:
                    if isinstance(a, int):
                        dup = a
                        continue
                    tags.append(a)
                    if "auto-style" in a:
                        self.need_sep_gen_opt = True
                    if "style-ex-only" in a:
                        self.need_sep_style_ex_opt = True
                    if "style-super" in a:
                        self.need_style_in_disc = True
                    if "sample-disc" in a:
                        self.sample_disc = True
                    if ("gen" not in a and "disc" not in a
                            and a != "split-style" and "triplet" not in a):
                        valid.add(a)
                    if ("disc" not in a and a != "split-style"
                            and "triplet" not in a):
                        evals.add(a)
                expanded.extend([list(tags)] * dup)
            stages.append((int(start), expanded))
        stages.sort(key=lambda s: s[0])
        self.stages = stages
        self.valid_tags = sorted(valid) + ["valid"]
        self.eval_tags = sorted(evals) + ["eval"]

    def get_lesson(self, iteration: int) -> List[str]:
        active: List[List[str]] = []
        for start, lessons in self.stages:
            if iteration >= start:
                active = lessons
        if not active:
            return []
        return active[iteration % len(active)]

    def lesson_key(self, iteration: int) -> str:
        """Stable signature used to pick the compiled step function."""
        return "+".join(sorted(self.get_lesson(iteration)))

    def distinct_lessons(self) -> List[List[str]]:
        seen, out = set(), []
        for _, lessons in self.stages:
            for l in lessons:
                k = "+".join(sorted(l))
                if k not in seen:
                    seen.add(k)
                    out.append(l)
        return out
