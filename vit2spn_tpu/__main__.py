import sys

from vit2spn_tpu.cli import main

sys.exit(main())
