import sys

from birdnet_go_tpu.cli.main import main

sys.exit(main())
