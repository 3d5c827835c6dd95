"""`python -m chitu_tpu` launches the server
(reference: chitu/__main__.py:1-5)."""

from chitu_tpu.serve import main

main()
