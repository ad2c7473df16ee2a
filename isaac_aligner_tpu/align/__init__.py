"""Alignment engine: seeding, matching, scoring, pairing, MAPQ.

Reference analog: src/c++/lib/alignment (MatchFinder / FragmentBuilder /
TemplateBuilder), re-designed as fixed-shape batched tensor programs.
"""
