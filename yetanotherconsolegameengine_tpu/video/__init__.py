"""Video/camera-to-terminal pipeline (the reference's VideoRenderer +
async frame readers, /root/reference/ConsoleGame/Renderer/VideoRenderer.cs,
Utils/AsyncFFMPEGVideoReader.cs, Utils/AsyncCameraReader.cs)."""
