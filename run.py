#!/usr/bin/env python
"""Server launcher (reference equivalent: /root/reference/run.py)."""
from chatterbox_tpu.serve.app import main

if __name__ == "__main__":
    main()
