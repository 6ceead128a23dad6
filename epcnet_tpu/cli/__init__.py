"""L4 drivers. The reference's entire API is ``python train.py`` /
``python evaluate.py`` with argparse flags [LINEAGE; SURVEY.md §1 L4].
These CLIs keep that workflow (plus generate_tuples + benchmark) on top of
the real library API."""
