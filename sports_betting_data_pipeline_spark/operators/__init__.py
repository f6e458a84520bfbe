"""Operator kit: pure DataFrame -> DataFrame transforms.

Modules map to SURVEY.md §2's inventory:

- relational: filters F1-F7, joins J1-J4, aggregations A1-A3 plus the
  standard analytic surface (windows, set ops, rollup/cube, top-k).
- flatten: the 4-level unnest centerpiece P1-P4 (main.py:40-177).
- temporal: the timestamp/timezone kit C1-C4.
- odds: ladder ops C8/J4 and odds<->probability math.
- wagers: the wager lifecycle T3/J3/K4 as MERGE-style batch transforms.
"""
