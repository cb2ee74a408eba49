LOAD SILENT <file:///nonexistent/void.nt>
