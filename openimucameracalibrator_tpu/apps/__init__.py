"""CLI application layer: equivalents of the reference's eight binaries and
Python drivers (SURVEY.md §2.4-2.5). Each module exposes ``main(argv)`` and
is runnable as ``python -m openimucameracalibrator_tpu.apps.<name>``."""
