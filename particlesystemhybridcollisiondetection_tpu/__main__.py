import sys

from particlesystemhybridcollisiondetection_tpu.cli import main

sys.exit(main())
