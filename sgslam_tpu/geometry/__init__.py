from . import se3, camera
