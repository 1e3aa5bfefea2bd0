from xframe_tpu.main import main
import sys

sys.exit(main())
