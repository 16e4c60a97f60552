"""Graph data model: vertices(id), edges(src, dst) canonical src < dst,
positions(id, pos: array<float>). See SURVEY.md §1."""
